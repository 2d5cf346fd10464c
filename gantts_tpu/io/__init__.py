"""IO: HTS labels/question sets and Merlin linguistic features."""

from gantts_tpu.io import hts, merlin  # noqa: F401
