"""Stencil (banded) MLPG: O(T*W) instead of the dense O(T^2) R matmul.

The unit-variance MLPG matrix R = P^{-1} W*^T (core/windows.py) is the
inverse of a banded SPD matrix times a banded matrix.  P^{-1}'s entries decay
geometrically away from the diagonal (for the standard 3-window set the decay
ratio is ~0.268 per frame), so every *interior* row of R converges to a fixed
Toeplitz stencil: R[t, k*T + t + j] -> s_k[j], independent of t and T.

This module exploits that:

  * interior frames: y[t] = sum_k sum_{|j|<=W} s_k[j] u_k[t+j] — ONE
    depthwise 1-D convolution on the MXU, with weights independent of the
    sequence length (so bucketed batches stop paying a per-length R build
    and the op costs O(T*W*S) instead of O(T^2*S));
  * the first/last W frames: exact boundary rows taken from a reference R
    computed once for a fixed T0 = 8W (rows of R for any T >= T0 agree with
    these to ~1e-12 because of the same geometric decay).

With W = 24 the result matches dense MLPG to ~1e-6 in float32 — below the
matmul's own rounding noise.  ``unit_variance_mlpg_stencil`` is a drop-in
replacement for ``unit_variance_mlpg`` on long-enough sequences
(T >= 4W + 2); the dense path remains for short ones.

The interior runs as a BLOCKED-TOEPLITZ dense matmul: 128-frame time
blocks with a W-frame halo contracted against a precomputed
(128, K, 128+2W) band matrix — large 128-aligned MXU matmuls, costing
2*(128+2W)*K*S FLOPs per frame vs 2*3T*S for dense R (strictly less work
past T ~= 176, and no O(T^2) R to build, ship, or store).  An earlier
depthwise grouped-conv formulation lowered to VPU-bound per-channel
convolutions and lost to dense 5x at T=512; the blocked matmul replaced it.

Measured on v5e (B=20, S=60, f32 HIGHEST; axon timing variance ~20%):

      T    dense ms   stencil ms   speedup    maxdiff
    256       0.98        0.96       1.0x     3.6e-7
    512       1.67        1.44       1.2x     4.8e-7
   1024       1.24        0.98       1.3x     7.2e-7
   2048       2.11        2.29       0.9x     7.2e-7
   4096       5.71        1.49       3.8x     9.5e-7
   8192       (dense R too large to compile)  stencil: 4.4 ms

i.e. parity at speech-typical lengths, a clear win for long sequences,
and the only option past T ~= 8k where the dense (T, 3T) R becomes
impractical.  ``mlpg_impl="dense"`` stays the training default (R is cached
per bucket and the matmul is not the step bottleneck); the stencil path is
the long-sequence and recompile-free (dynamic-length) option.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import flax.struct
import jax
import jax.numpy as jnp

from gantts_tpu.core.windows import unit_variance_mlpg_matrix

DEFAULT_HALFWIDTH = 24


BLOCK_T = 128  # time-block size for the blocked-Toeplitz interior matmul


def _windows_key(windows):
    return tuple((int(l), int(u), tuple(np.asarray(c, dtype=np.float64)))
                 for l, u, c in windows)


@lru_cache(maxsize=16)
def _block_matrix(windows_key, halfwidth, block_t):
    """(block_t, K, block_t + 2W) dense embed of the Toeplitz stencil:
    M[a, k, c] = s_k[c - a - W] (0 outside the band).  T-independent."""
    stencil, _, _ = _stencil_parts(windows_key, halfwidth)
    K, width = stencil.shape
    M = np.zeros((block_t, K, block_t + 2 * halfwidth), dtype=np.float32)
    for a in range(block_t):
        M[a, :, a: a + width] = stencil
    return M


def _interior_blocked(u, stencil_key, W, precision):
    """Interior stencil product as a blocked-Toeplitz DENSE matmul.

    u: (B, T, K, S).  Splits time into BLOCK_T-frame blocks with a W-frame
    halo on each side and contracts each block against the precomputed
    (BLOCK_T, K, BLOCK_T+2W) band matrix — large, 128-aligned MXU matmuls
    instead of the depthwise grouped conv (which lowers to VPU-bound
    per-channel convolutions and measured ~5x SLOWER than dense at T=512).
    FLOPs: 2*(BLOCK_T+2W)*K*S per output frame vs 2*3T*S dense — past
    T ~= 176 the blocked form does strictly less MXU work.
    """
    B, T, K, S = u.shape
    Tb = BLOCK_T
    n_blk = -(-T // Tb)
    Tpad = n_blk * Tb
    u_p = jnp.pad(u, ((0, 0), (W, Tpad - T + W), (0, 0), (0, 0)))
    halo = Tb + 2 * W
    blocks = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(u_p, i * Tb, halo, axis=1)
         for i in range(n_blk)], axis=1)  # (B, n_blk, halo, K, S)
    M = jnp.asarray(_block_matrix(stencil_key, W, Tb))
    y = jnp.einsum("bnhks,tkh->bnts", blocks, M, precision=precision)
    return y.reshape(B, Tpad, S)[:, :T]


@lru_cache(maxsize=16)
def _stencil_parts(windows_key, halfwidth):
    windows = [(l, u, np.array(c)) for l, u, c in windows_key]
    W = halfwidth
    T0 = 8 * W
    K = len(windows)
    R0 = unit_variance_mlpg_matrix(windows, T0, dtype=np.float64)
    mid = T0 // 2
    # stencil: (K, 2W+1), s_k[j] = R[mid, k*T0 + mid + (j - W)]
    stencil = np.stack([
        R0[mid, k * T0 + mid - W: k * T0 + mid + W + 1] for k in range(K)])
    C = 2 * W  # boundary rows only reach C columns into each window block
    top = np.stack([R0[:W, k * T0: k * T0 + C] for k in range(K)])      # (K, W, C)
    bot = np.stack([R0[T0 - W:, k * T0 + T0 - C: k * T0 + T0]
                    for k in range(K)])                                  # (K, W, C)
    # NumPy, not jnp: jnp constants created while tracing would leak that
    # trace's tracers through the lru_cache into later jit calls.
    return (stencil.astype(np.float32), top.astype(np.float32),
            bot.astype(np.float32))


def unit_variance_mlpg_stencil(means, windows, halfwidth=DEFAULT_HALFWIDTH,
                               precision=None):
    """Stencil MLPG on (B, T, K*S) (or (T, K*S)) features.

    Requires T >= 4*halfwidth + 2 (callers fall back to the dense path
    below that).  Numerically interchangeable with
    ``unit_variance_mlpg(unit_variance_mlpg_matrix(windows, T), means)``.
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    squeeze = means.ndim == 2
    if squeeze:
        means = means[None]
    B, T, KS = means.shape
    K = len(windows)
    S = KS // K
    W = halfwidth
    if T < 4 * W + 2:
        raise ValueError(f"T={T} too short for stencil MLPG (need >= {4*W+2})")
    key = _windows_key(windows)
    _, top, bot = _stencil_parts(key, W)
    top = jnp.asarray(top)
    bot = jnp.asarray(bot)
    C = 2 * W

    u = means.reshape(B, T, K, S)

    # ---- interior: blocked-Toeplitz dense matmul (MXU-shaped) -------------
    y = _interior_blocked(u, key, W, precision)

    # ---- exact boundaries --------------------------------------------------
    # y_top = sum_k u_k[:, :C] @ top_k^T : (B, C, S) x (W, C) -> (B, W, S)
    y_top = jnp.einsum("bcks,kwc->bws", u[:, :C], top, precision=precision)
    y_bot = jnp.einsum("bcks,kwc->bws", u[:, T - C:], bot,
                       precision=precision)
    y = y.at[:, :W].set(y_top).at[:, T - W:].set(y_bot)
    return y[0] if squeeze else y


class MLPGStencil(flax.struct.PyTreeNode):
    """Length-generalizing MLPG operator: pass this IN PLACE OF the dense R
    to ``core.paramgen.unit_variance_mlpg`` (plus per-example lengths).

    Carries the Toeplitz interior stencil and the exact T-independent
    boundary blocks; one jitted program then serves EVERY utterance length
    (the boundary rows are placed at the true length with dynamic slices),
    eliminating the per-length recompiles of exact-R evaluation.

    ``windows_key`` is static (not a pytree leaf) so the blocked interior
    matrix can be built host-side even when the operator itself is traced.
    """

    stencil: jnp.ndarray   # (K, 2W+1)
    top: jnp.ndarray       # (K, W, C)
    bot: jnp.ndarray       # (K, W, C)
    windows_key: tuple = flax.struct.field(pytree_node=False, default=None)

    @property
    def halfwidth(self):
        return self.top.shape[1]

    @classmethod
    def create(cls, windows, halfwidth=DEFAULT_HALFWIDTH):
        key = _windows_key(windows)
        stencil, top, bot = _stencil_parts(key, halfwidth)
        return cls(stencil=jnp.asarray(stencil), top=jnp.asarray(top),
                   bot=jnp.asarray(bot), windows_key=key)


def unit_variance_mlpg_dynamic(op: MLPGStencil, means, lengths,
                               precision=None):
    """Stencil MLPG on zero-padded (B, Tp, K*S) features with per-example
    true lengths (traced values; Tp static).

    Exactness: frames [W, length-W) come from the interior stencil (their
    receptive field lies inside the valid region because length >= 4W+2 is
    required of callers at trace time via Tp... enforced per example by the
    caller); frames [0, W) and [length-W, length) are overwritten with the
    exact boundary solutions; frames >= length are zeroed.
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    squeeze = means.ndim == 2
    if squeeze:
        means = means[None]
        lengths = jnp.reshape(lengths, (1,))
    B, Tp, KS = means.shape
    K = op.stencil.shape[0]
    S = KS // K
    W = op.halfwidth
    C = 2 * W

    if op.windows_key is None:
        raise ValueError(
            "MLPGStencil was constructed directly; build it with "
            "MLPGStencil.create(windows) — the blocked interior needs the "
            "static windows_key (the stencil array itself may be traced)")
    u = means.reshape(B, Tp, K, S)

    # interior: blocked-Toeplitz matmul (same math as the static-shape path)
    y = _interior_blocked(u, op.windows_key, W, precision)

    # exact top boundary (static position)
    y_top = jnp.einsum("bcks,kwc->bws", u[:, :C], op.top,
                       precision=precision)
    y = y.at[:, :W].set(y_top)

    # exact bottom boundary at the dynamic position length-C per example
    def fix_bottom(y_b, u_b, L):
        u_tail = jax.lax.dynamic_slice(u_b, (L - C, 0, 0),
                                       (C, u_b.shape[1], u_b.shape[2]))
        y_bot = jnp.einsum("cks,kwc->ws", u_tail, op.bot,
                           precision=precision)
        return jax.lax.dynamic_update_slice(y_b, y_bot, (L - W, 0))

    y = jax.vmap(fix_bottom)(y, u, lengths)

    # zero the padding
    mask = (jnp.arange(Tp)[None, :] < lengths[:, None]).astype(y.dtype)
    y = y * mask[:, :, None]
    return y[0] if squeeze else y


def multi_stream_mlpg_stencil(inputs, windows, stream_sizes,
                              has_dynamic_features,
                              streams=None, halfwidth=DEFAULT_HALFWIDTH):
    """Stencil variant of ``core.paramgen.multi_stream_mlpg`` (no R input)."""
    if streams is None:
        streams = (True,) * len(stream_sizes)
    start_indices = np.hstack(([0], np.cumsum(stream_sizes)[:-1])).astype(int)
    ret = []
    for start_idx, size, v, enabled in zip(
            start_indices, stream_sizes, has_dynamic_features, streams):
        if not enabled:
            continue
        x = inputs[..., start_idx:start_idx + size]
        y = unit_variance_mlpg_stencil(x, windows, halfwidth) if v else x
        ret.append(y)
    return jnp.concatenate(ret, axis=-1)
