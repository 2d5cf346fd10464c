"""Pallas TPU kernels for the hot ops.

``USE_PALLAS_SRU`` selects the Pallas scan for the SRU recurrence
(models/sru.py) when running on TPU; the associative-scan formulation remains
the fallback on other backends and the numerical oracle in tests.
"""

import jax

from gantts_tpu.kernels.lstm_scan import fused_lstm_layer  # noqa: F401
from gantts_tpu.kernels.sru_scan import (  # noqa: F401
    fused_sru_layer,
    linear_recurrence_pallas,
    pallas_linear_recurrence,
)


def default_use_pallas():
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:  # no backend initialized
        return False
