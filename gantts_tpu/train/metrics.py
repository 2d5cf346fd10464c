"""Masked speech-domain distortion metrics (JAX, in-jit).

TPU-native equivalents of the ``nnmnkwii.metrics`` calls in the reference's
``compute_distortions`` (train.py:399-432): mel-cepstrum distortion, F0 RMSE
in the linear domain, V/UV error and duration RMSE.  All are computed on
device inside the jitted train step — the reference instead synced every
batch to the host (train.py:588-590), one of the inefficiencies the rebuild
removes.

Conventions (matching nnmnkwii):
  melcd        = 10*sqrt(2)/ln(10) * mean_t ||x_t - y_t||_2   over valid frames
  lf0 MSE      over frames voiced in BOTH sequences (linear domain: exp first);
                nan when no such frame exists (reference catches
                ZeroDivisionError -> nan, train.py:404-409)
  vuv_error    fraction of valid frames with differing V/UV decisions
  mse          element mean over valid frames (duration model)
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# Plain-Python constant: importing this module must never touch a device
# backend (a module-level jnp expression would initialize one, which breaks
# "import gantts_tpu, then pick a platform" flows like dryrun_multichip).
_LOGDB = 10.0 / math.log(10.0) * math.sqrt(2.0)


def melcd(x, y, mask):
    """x, y: (B, T, D); mask: (B, T, 1) validity."""
    d = x - y
    per_frame = jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True))
    return _LOGDB * jnp.sum(per_frame * mask) / jnp.sum(mask)


def lf0_mean_squared_error(lf0, vuv, lf0_hat, vuv_hat, mask,
                           linear_domain=True):
    """vuv/vuv_hat are binarized {0,1}; returns nan if no co-voiced frame."""
    both = (vuv > 0.5) & (vuv_hat > 0.5) & (mask[..., 0] > 0.5)
    both_f = both.astype(lf0.dtype)
    a = jnp.exp(lf0) if linear_domain else lf0
    b = jnp.exp(lf0_hat) if linear_domain else lf0_hat
    d = (a - b)[..., 0] if a.ndim == 3 else (a - b)
    num = jnp.sum(d * d * both_f)
    cnt = jnp.sum(both_f)
    return jnp.where(cnt > 0, num / jnp.maximum(cnt, 1.0), jnp.nan)


def vuv_error(vuv, vuv_hat, mask):
    m = mask[..., 0]
    diff = (jnp.abs((vuv > 0.5).astype(jnp.float32)
                    - (vuv_hat > 0.5).astype(jnp.float32)))
    if diff.ndim == 3:
        diff = diff[..., 0]
    return jnp.sum(diff * m) / jnp.sum(m)


def mean_squared_error(x, y, mask):
    """Element mean over valid frames (duration metric, train.py:420-421)."""
    d = (x - y) * mask
    return jnp.sum(d * d) / (jnp.sum(mask) * x.shape[-1])
