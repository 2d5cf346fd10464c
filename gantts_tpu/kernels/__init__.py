"""Pallas TPU kernels for the hot ops.

``USE_PALLAS_SRU`` selects the Pallas scan for the SRU recurrence
(models/sru.py) when running on TPU; the associative-scan formulation remains
the fallback on other backends and the numerical oracle in tests.
"""

import jax

from gantts_tpu.kernels.lstm_scan import (  # noqa: F401
    bilstm_proj_feasible,
    fused_bilstm_proj_layer,
    fused_lstm_layer,
    fused_lstm_proj_layer,
    lstm_proj_feasible,
)
from gantts_tpu.kernels.sru_scan import (  # noqa: F401
    fused_sru_layer,
    fused_sru_proj_layer,
    linear_recurrence_pallas,
    pallas_linear_recurrence,
    sru_proj_feasible,
)


def default_use_pallas():
    """Fused Pallas kernels on TPU; scan formulations elsewhere.

    ``GANTTS_TPU_DP_FALLBACK_SCAN=1`` forces the scan formulations even on
    TPU — a safety valve for multi-chip pods: the sharded GAN step traces
    and runs with the Pallas kernels under an Auto-axis mesh (pinned by
    tests/test_parallel.py on the CPU mesh), but whether XLA partitions or
    replicates the Mosaic custom call on real multi-chip hardware is
    backend-version-dependent; the scan paths are fully GSPMD-partitionable.
    """
    import os

    if os.environ.get("GANTTS_TPU_DP_FALLBACK_SCAN"):
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:  # no backend initialized
        return False
