"""Differentiable MLPG on device (JAX) — the training-loop hot kernel.

TPU-native replacement for ``nnmnkwii.autograd.unit_variance_mlpg`` (Cython +
torch autograd Function; reference use: gantts/models.py:66,115 and
gantts/multistream.py:120) and ``gantts.multistream.multi_stream_mlpg``
(gantts/multistream.py:82-123).

On TPU the whole operation is a single batched matmul against the precomputed
``R`` matrix from :mod:`gantts_tpu.core.windows` — it maps straight onto the
MXU and is differentiated for free by JAX (no hand-written VJP needed: the
backward of ``R @ m`` is ``R^T @ g``, another matmul).

Layout contract (identical to the reference): the feature axis of a stream
with K windows is ``[static-block | delta-block | ... ]`` each ``S`` wide;
``R`` is (T, K*T) with the window-major column layout produced by
``unit_variance_mlpg_matrix``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def unit_variance_mlpg(R, means, lengths=None, precision=None):
    """Apply the unit-variance MLPG matrix to a static+dynamic trajectory.

    Args:
      R: (T, K*T) MLPG matrix (from ``core.windows.unit_variance_mlpg_matrix``)
        OR a ``core.fast_mlpg.MLPGStencil`` — the length-generalizing
        operator (then ``lengths`` gives each example's true length and
        ``means`` may be zero-padded to any static T).
      means: (B, T, K*S) or (T, K*S) normalized static+dynamic features.
      lengths: (B,) true lengths, only used with an MLPGStencil.
      precision: matmul precision; defaults to HIGHEST because the TPU MXU's
        default bf16 accumulation visibly distorts the recovered statics
        (MLPG errors are feature-domain distortion, not just loss noise).

    Returns:
      (B, T, S) (or (T, S)) maximum-likelihood static trajectory.

    Mirrors nnmnkwii.autograd.UnitVarianceMLPG.forward: per-frame window
    blocks are re-laid-out window-major ((K*T, S)) then left-multiplied by R.
    """
    import jax.lax

    from gantts_tpu.core.fast_mlpg import MLPGStencil, unit_variance_mlpg_dynamic

    if isinstance(R, MLPGStencil):
        if lengths is None:
            raise ValueError("MLPGStencil mode requires per-example lengths")
        return unit_variance_mlpg_dynamic(R, means, lengths,
                                          precision=precision)

    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    T = R.shape[0]
    K = R.shape[1] // T
    squeeze = means.ndim == 2
    if squeeze:
        means = means[None]
    B, Tm, KS = means.shape
    if Tm != T:
        raise ValueError(f"means time axis {Tm} != R time axis {T}")
    if KS % K:
        raise ValueError(f"means feature dim {KS} not divisible by {K} windows")
    S = KS // K
    # (B, T, K, S) -> (B, K, T, S) -> (B, K*T, S): window-major stacking.
    m = means.reshape(B, T, K, S).transpose(0, 2, 1, 3).reshape(B, K * T, S)
    out = jnp.einsum("tu,bus->bts", R, m, precision=precision)
    return out[0] if squeeze else out


def multi_stream_mlpg(inputs, R, stream_sizes=(180, 3, 1, 3),
                      has_dynamic_features=(True, True, False, True),
                      streams=(True, True, True, True)):
    """Split multi-stream features and apply MLPG to the dynamic streams.

    Equivalent of gantts/multistream.py:82-123. ``inputs`` is (B, T, D) with
    D == sum(stream_sizes); streams without dynamic features pass through.
    Stream boundaries are Python ints, so all slices are static under jit.
    """
    num_windows = 1 if R is None else R.shape[1] // R.shape[0]
    D = inputs.shape[-1]
    if D != int(np.sum(stream_sizes)):
        raise RuntimeError(
            "You probably have specified wrong dimension params: "
            f"inputs D={D}, sum(stream_sizes)={int(np.sum(stream_sizes))}")
    for size, dyn in zip(stream_sizes, has_dynamic_features):
        if dyn and size % num_windows:
            raise RuntimeError(
                f"dynamic stream size {size} not divisible by "
                f"{num_windows} windows")

    start_indices = np.hstack(([0], np.cumsum(stream_sizes)[:-1])).astype(int)
    ret = []
    for start_idx, size, v, enabled in zip(
            start_indices, stream_sizes, has_dynamic_features, streams):
        if not enabled:
            continue
        x = inputs[..., start_idx:start_idx + size]
        y = unit_variance_mlpg(R, x) if v else x
        ret.append(y)
    return jnp.concatenate(ret, axis=-1)
