"""Analysis and observability utilities."""

from gantts_tpu.utils.analysis import global_variance, modulation_spectrum  # noqa: F401
