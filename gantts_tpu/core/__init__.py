"""Core math: windows/MLPG (host + device), streams, masking."""

from gantts_tpu.core.windows import (  # noqa: F401
    DEFAULT_WINDOWS,
    build_win_mats,
    delta_features,
    mlpg,
    unit_variance_mlpg_matrix,
    window_half_bandwidth,
)
from gantts_tpu.core.paramgen import multi_stream_mlpg, unit_variance_mlpg  # noqa: F401
from gantts_tpu.core.streams import (  # noqa: F401
    get_static_features,
    get_static_stream_sizes,
    recompute_delta_features,
    select_streams,
)
from gantts_tpu.core.masking import masked_mse_loss, sequence_mask  # noqa: F401
