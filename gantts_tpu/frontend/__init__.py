"""Vocoder front-end: WORLD-equivalent analysis/synthesis + mel-cepstrum
transforms + MLSA filter (host-side; C++ hot paths with NumPy oracles)."""

from gantts_tpu.frontend import native, sptk, world  # noqa: F401
