"""Pallas TPU kernel for the SRU linear recurrence (and its gradient).

The SRU cell's only sequential dependency is the first-order recurrence

    c_t = f_t * c_{t-1} + b_t,            c_0 = 0

(models/sru.py).  Two device formulations exist in this framework:

  * ``jax.lax.associative_scan`` (models/sru.py): O(log T) depth but moves
    ~2 log2(T) full copies of the (B, T, H) tensors through HBM;
  * this kernel: a grid-over-time Pallas scan — each grid step is one
    (B, H) elementwise VPU op with the carry held in VMEM scratch across
    grid iterations, so the total HBM traffic is exactly one read of f and
    b and one write of c (the information-theoretic minimum).  For
    B=20, T=512, H=512 that is ~63 MB vs ~1.5 GB for the associative scan.

The backward pass is the reversed recurrence

    ghat_t = g_t + f_{t+1} * ghat_{t+1};   db_t = ghat_t;
    df_t = ghat_t * c_{t-1}

implemented as a second Pallas kernel running the grid in reverse via its
index maps, wrapped in ``jax.custom_vjp``.

Shapes are padded to TPU tiles ((8, 128) for f32) by the public wrapper;
CPU/interpret execution is supported for tests (``interpret=True`` when not
on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu():
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:
        return False


def _round_up(n, m):
    return -(-n // m) * m


_MAX_CHUNK = 16  # timesteps per grid step (amortizes grid/pipeline overhead)
_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the 16 MB VMEM limit


def _pick_chunk(B, H, dtype_bytes=4):
    """Largest power-of-two chunk whose pipelined blocks fit in VMEM.

    Per grid step the pipeline holds ~2x (double buffering) of the three
    (chunk, B, H) blocks plus the (B, H) carry; oversized blocks fail at
    compile time with a scoped-vmem OOM (seen at B=96, H=512, chunk=16).
    """
    chunk = _MAX_CHUNK
    while chunk > 1 and 6 * chunk * B * H * dtype_bytes > _VMEM_BUDGET:
        chunk //= 2
    return chunk


def _fwd_kernel(f_ref, b_ref, o_ref, c_ref):
    # blocks are (CHUNK, B, H): time leads, trailing dims are full tiles
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        c_ref[...] = jnp.zeros_like(c_ref)

    def body(i, c):
        c = f_ref[i] * c + b_ref[i]
        o_ref[i] = c
        return c

    c_ref[...] = jax.lax.fori_loop(0, f_ref.shape[0], body, c_ref[...])


def _bwd_kernel(g_ref, fs_ref, o_ref, gh_ref):
    t = pl.program_id(0)  # reversed chunk order via the index maps

    @pl.when(t == 0)
    def _():
        gh_ref[...] = jnp.zeros_like(gh_ref)

    n = g_ref.shape[0]

    def body(i, gh):
        j = n - 1 - i  # reverse within the chunk
        gh = g_ref[j] + fs_ref[j] * gh
        o_ref[j] = gh
        return gh

    gh_ref[...] = jax.lax.fori_loop(0, n, body, gh_ref[...])


def _scan_call(kernel, a, b, reverse=False):
    # a, b: (T, B, H) time-major, T padded to a chunk multiple by the wrapper
    T, B, H = a.shape
    chunk = _pick_chunk(B, H)
    assert T % chunk == 0
    n_chunks = T // chunk
    spec_fwd = pl.BlockSpec((chunk, B, H), lambda t: (t, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_rev = pl.BlockSpec((chunk, B, H),
                            lambda t: (n_chunks - 1 - t, 0, 0),
                            memory_space=pltpu.VMEM)
    spec = spec_rev if reverse else spec_fwd
    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((T, B, H), a.dtype),
        scratch_shapes=[pltpu.VMEM((B, H), a.dtype)],
        interpret=not _on_tpu(),
    )(a, b)


@jax.custom_vjp
def pallas_linear_recurrence(f, b):
    """c_t = f_t * c_{t-1} + b_t along axis 0; (T, B, H) time-major,
    tile-padded inputs.  Use :func:`linear_recurrence_pallas` for the
    batch-major padding wrapper.
    """
    return _scan_call(_fwd_kernel, f, b)


def _fwd(f, b):
    c = _scan_call(_fwd_kernel, f, b)
    return c, (f, c)


def _bwd(res, g):
    f, c = res
    # f_{t+1} aligned at t (last row's value is unused: carry starts at 0)
    f_next = jnp.concatenate([f[1:], jnp.zeros_like(f[:1])], axis=0)
    ghat = _scan_call(_bwd_kernel, g, f_next, reverse=True)
    c_prev = jnp.concatenate([jnp.zeros_like(c[:1]), c[:-1]], axis=0)
    return ghat * c_prev, ghat


pallas_linear_recurrence.defvjp(_fwd, _bwd)


def linear_recurrence_pallas(f, b):
    """Batch-major wrapper: (B, T, H) in/out, pads B to 8 and H to 128 and
    transposes to time-major for the kernel.

    Padding is safe: padded f rows are 0 (carry stays 0), padded b is 0,
    and time padding appends dead steps whose outputs are sliced away (the
    backward reverse scan starts in the padded region with ghat = g = 0).
    """
    B, T, H = f.shape
    Bp, Hp = _round_up(max(B, 1), 8), _round_up(max(H, 1), 128)
    Tp = _round_up(max(T, 1), _pick_chunk(_round_up(max(B, 1), 8),
                                          _round_up(max(H, 1), 128)))
    f = jnp.swapaxes(f, 0, 1)
    b = jnp.swapaxes(b, 0, 1)
    if (Tp, Bp, Hp) != (T, B, H):
        f = jnp.pad(f, ((0, Tp - T), (0, Bp - B), (0, Hp - H)))
        b = jnp.pad(b, ((0, Tp - T), (0, Bp - B), (0, Hp - H)))
    c = pallas_linear_recurrence(f, b)
    if (Tp, Bp, Hp) != (T, B, H):
        c = c[:T, :B, :H]
    return jnp.swapaxes(c, 0, 1)
