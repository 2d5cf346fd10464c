"""Training engine: fused jitted G+D step, loop, optimizers, checkpoints."""

from gantts_tpu.train.step import (  # noqa: F401
    GanTrainer,
    StepConfig,
    TrainState,
    compute_distortions,
    get_selected_static_stream,
)
from gantts_tpu.train.loop import RMatrixCache, train_loop  # noqa: F401
from gantts_tpu.train.optim import (  # noqa: F401
    create_optimizer,
    exp_decayed_lr,
    set_learning_rate,
)
from gantts_tpu.train.checkpoint import load_checkpoint, save_checkpoint  # noqa: F401
