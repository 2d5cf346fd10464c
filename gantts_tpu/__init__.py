"""gantts_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of r9y9/gantts: GAN-based statistical parametric speech
synthesis (TTS) and voice conversion (VC) over WORLD vocoder features.

Layers (SURVEY.md section 7):
  core/           stream math, MLPG, masking (JAX device math + host solvers)
  models/         generator/discriminator zoo as Flax modules (registry by name)
  data/           .npy pipeline, deterministic splits, bucketed batching
  train/          fused G+D jitted step, loop, optimizers, checkpoints, metrics
  parallel/       mesh construction + data-parallel sharding over ICI
  kernels/        Pallas TPU kernels (SRU scan, fused losses)
  preprocessing/  host-side normalization/smoothing/alignment (nnmnkwii parity)
  frontend/       WORLD/SPTK-equivalent vocoder (C++ host library + bindings)
  io/             HTS label / question-set parsing, Merlin linguistic features
"""

try:  # written by setup.py at build time with the git commit id appended
    from gantts_tpu.version import version as __version__
except ImportError:  # running from a source checkout without a build
    __version__ = "0.1.0"

import os as _os

if _os.environ.get("GANTTS_TPU_PLATFORM"):
    # Reliable platform pin for EVERY entry point (eval/prep CLIs included,
    # not just train.py): plain JAX_PLATFORMS can be ignored here because
    # sitecustomize imports jax first (CLAUDE.md trap).  config.update works
    # any time before the first backend initialization.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["GANTTS_TPU_PLATFORM"])

from gantts_tpu import core  # noqa: F401
