"""Fused Pallas TPU kernel for the masked LSTM layer (the cuDNN-RNN slot).

The reference runs its (bi)LSTM generators through cuDNN's fused RNN
kernels (SURVEY.md §2.3: models.py:84, 100-112).  The pure-XLA port
(models/recurrent.py) hoists the input projection into one big MXU matmul
and runs the recurrence as ``lax.scan`` — correct, but each scan step pays
XLA loop overhead around a tiny (B, 4H) body, measured ~6.3 us/step at
B=20, H=512 (19.3 ms forward for a 3x512 biLSTM trunk).

This kernel runs the whole recurrence as ONE Pallas grid over time:

  * the recurrent weights W_hh live in VMEM for the entire scan;
  * per timestep the kernel does the (B, H) x (H, 4H) recurrent matmul on
    the MXU plus all gate math on the VPU, with the h/c carries held in
    VMEM scratch across grid steps;
  * masking (torch pack_padded semantics: carries freeze past each row's
    length, outputs zero) is computed in-kernel from the length vector;
  * the backward pass is classic BPTT, fused the same way.  The forward
    stores the four ACTIVATED gate values (one (T, B, 4H) I/O-dtype
    array), so the backward's per-step work is pure VPU gate math plus
    the single irreducibly-sequential MXU matmul dh = dgates @ W_hh^T.
    At the small batches this family ships with (B=20 -> 24 padded rows
    of a 128-row MXU tile) every per-step matmul runs ~20% utilized, so
    round 4 moved the OTHER two matmuls the old backward ran per step
    out of the kernel: the gate recompute (h_prev @ W_hh) is replaced by
    the stored gates, and dW_hh = sum_t h_{t-1}^T dgates_t becomes ONE
    near-peak XLA matmul over the time-shifted stored outputs.  tanh(c_t)
    is recovered EXACTLY from the stored f32 c trajectory (for masked
    frames the adjoint is zero, so the carried value is never consumed);
    the bias gradient still accumulates into a VMEM-resident f32 block
    (cheap VPU reduction), and the reverse-time adjoint carries (Dh, Dc)
    stay in scratch;
  * direction is handled by index maps (reverse traversal), so the
    bidirectional stack needs NO time-flip materialization.

I/O dtype follows the compute dtype (bf16 operands halve HBM traffic; all
in-kernel math, both carries, the stored c trajectory, and the weight/bias
gradients are f32).  W_hh enters the custom-vjp boundary in its parameter
dtype (f32) so its cotangent is f32; the cast to the compute dtype happens
inside, once, before the kernel.  Equivalence with the lax.scan oracle
(forward and all gradients) is pinned in tests/test_kernels.py, interpret
mode included.

Gate order is torch's (i, f, g, o) — models/recurrent.py:48.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gantts_tpu.kernels.sru_scan import (
    _FUSED_BUDGET,
    _FUSED_MAX_CHUNK,
    _FUSED_VMEM_LIMIT,
    _PROJ_VMEM_LIMIT,
    _VMEM_BUDGET,
    _on_tpu,
    _proj_u,
    _round_up,
    fit_chunk as _lstm_chunk_impl,
)


def _lstm_chunk(B, H, per_h_bytes, resident_bytes):
    # sized against the raised scoped-vmem cap (see sru_scan._FUSED_BUDGET)
    return _lstm_chunk_impl(per_h_bytes, B, H, resident_bytes,
                            budget=_FUSED_BUDGET,
                            max_chunk=_FUSED_MAX_CHUNK)


def kernel_feasible(B, H, compute_dtype):
    """True if the fused kernel's RESIDENT working set (W_hh in the compute
    dtype, the f32 db output block, the four carries) fits the VMEM
    budget with at least a chunk-1 pipeline.  When it does not (very large
    hidden_dim x batch), callers must use the lax.scan fallback — bottoming
    out at chunk=1 would otherwise compile into an opaque Mosaic
    scoped-vmem OOM."""
    Bp = _round_up(max(B, 1), 8)
    Hp = _round_up(max(H, 1), 128)
    sw = jnp.dtype(compute_dtype).itemsize
    resident = Hp * 4 * Hp * sw + 8 * 4 * Hp * 4 + 4 * Bp * Hp * 4
    # bwd pipeline per H lane, chunk 1: g4 + dgates out + gh + c/cp f32
    per_h = 4 * sw + 4 * sw + sw + 2 * 4
    return 2 * 1 * Bp * Hp * per_h + resident <= _VMEM_BUDGET


def _gates(xp_t, b_row, h_prev, whh):
    """(B, 4H) gate values: xp + bias + h_prev @ W_hh, math in f32."""
    f32 = jnp.float32
    pre = xp_t.astype(f32) + b_row
    pre = pre + jax.lax.dot_general(
        h_prev.astype(whh.dtype), whh,
        (((1,), (0,)), ((), ())), preferred_element_type=f32)
    H = h_prev.shape[-1]
    i = jax.nn.sigmoid(pre[:, 0:H])
    f = jax.nn.sigmoid(pre[:, H:2 * H])
    g = jnp.tanh(pre[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(pre[:, 3 * H:4 * H])
    return i, f, g, o


def _store_gates(g4_ref, j, ig, fg, gg, og):
    H = ig.shape[-1]
    od = g4_ref.dtype
    g4_ref[j, :, 0:H] = ig.astype(od)
    g4_ref[j, :, H:2 * H] = fg.astype(od)
    g4_ref[j, :, 2 * H:3 * H] = gg.astype(od)
    g4_ref[j, :, 3 * H:4 * H] = og.astype(od)


def _dir_fwd_step(xp_j, b_row, h, c, m, whh, y_ref, c_ref, g4_ref, j):
    """One masked LSTM cell step for one direction — THE pinned cell
    math, shared by every forward kernel in this module (single-direction,
    projection-fused, and bidirectional)."""
    ig, fg, gg, og = _gates(xp_j, b_row, h, whh)
    c_new = fg * c + ig * gg
    h_new = og * jnp.tanh(c_new)
    h = m * h_new + (1.0 - m) * h
    c = m * c_new + (1.0 - m) * c
    y_ref[j] = (h_new * m).astype(y_ref.dtype)
    c_ref[j] = c
    _store_gates(g4_ref, j, ig, fg, gg, og)
    return h, c


def _dir_bwd_step(g4_j, gh_j, c_j, c_prev, m, dh, dc, whh,
                  dxp_ref, db_ref, j):
    """One masked BPTT step for one direction — THE pinned adjoint math,
    shared by the single-direction and bidirectional backward kernels."""
    f32 = jnp.float32
    H = dh.shape[-1]
    ig = g4_j[:, 0:H].astype(f32)
    fg = g4_j[:, H:2 * H].astype(f32)
    gg = g4_j[:, 2 * H:3 * H].astype(f32)
    og = g4_j[:, 3 * H:4 * H].astype(f32)
    tc = jnp.tanh(c_j)
    da = m * (dh + gh_j.astype(f32))
    do_ = da * tc
    dc_new = da * og * (1.0 - tc * tc) + m * dc
    di = dc_new * gg
    df = dc_new * c_prev
    dg = dc_new * ig
    dgi = di * ig * (1.0 - ig)
    dgf = df * fg * (1.0 - fg)
    dgg = dg * (1.0 - gg * gg)
    dgo = do_ * og * (1.0 - og)
    _store_gates(dxp_ref, j, dgi, dgf, dgg, dgo)
    dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=-1)
    db_ref[0, :] += jnp.sum(dgates, axis=0)
    dh = (1.0 - m) * dh + jax.lax.dot_general(
        dgates.astype(whh.dtype), whh,
        (((1,), (1,)), ((), ())), preferred_element_type=f32)
    dc = (1.0 - m) * dc + dc_new * fg
    return dh, dc


def _lstm_fwd_kernel(rev, chunk, n_chunks,
                     xp_ref, whh_ref, b_ref, len_ref,
                     y_ref, c_ref, g4_ref, h_carry, c_carry):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_carry[...] = jnp.zeros_like(h_carry)
        c_carry[...] = jnp.zeros_like(c_carry)

    lv = len_ref[...]                 # (B, H) float lengths
    f32 = jnp.float32
    block = (n_chunks - 1 - t) if rev else t
    whh = whh_ref[...]
    b_row = b_ref[0].astype(f32)      # (4H,)

    def body(i_loop, carry):
        h, c = carry                  # f32 (B, H)
        j = (chunk - 1 - i_loop) if rev else i_loop
        s = block * chunk + j
        m = (s < lv).astype(f32)
        return _dir_fwd_step(xp_ref[j], b_row, h, c, m, whh,
                             y_ref, c_ref, g4_ref, j)

    h_carry[...], c_carry[...] = jax.lax.fori_loop(
        0, chunk, body, (h_carry[...], c_carry[...]))


def _lstm_bwd_kernel(layer_rev, chunk, n_chunks,
                     g4_ref, whh_ref, len_ref,
                     c_ref, cp_ref, gh_ref,
                     dxp_ref, db_ref,
                     dh_carry, dc_carry):
    # Traverses the OPPOSITE direction of the forward pass.  cp is the
    # same c array viewed one block earlier in FORWARD-traversal order,
    # for the chunk-boundary c_{t-1}.  Gates come from the forward's
    # stored g4 block; tanh(c_t) is recovered from the stored f32 carry
    # (exact for every unmasked frame — masked frames have zero adjoint).
    # The only per-step MXU work left is the sequential dh matmul; dW_hh
    # is reconstructed OUTSIDE from dxp and the time-shifted y.
    rev = not layer_rev
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dh_carry[...] = jnp.zeros_like(dh_carry)
        dc_carry[...] = jnp.zeros_like(dc_carry)
        db_ref[...] = jnp.zeros_like(db_ref)

    lv = len_ref[...]
    f32 = jnp.float32
    block = (n_chunks - 1 - t) if rev else t
    whh = whh_ref[...]
    # forward-traversal-previous element: storage index t-1 for a forward
    # layer, t+1 for a reverse layer; at the traversal start it is zeros
    edge = 0 if layer_rev else chunk - 1  # its in-block index in cp

    def body(i_loop, carry):
        dh, dc = carry                # f32 (B, H)
        j = (chunk - 1 - i_loop) if rev else i_loop
        s = block * chunk + j
        m = (s < lv).astype(f32)
        if layer_rev:
            first = s == (n_chunks * chunk - 1)
            jp = j + 1
        else:
            first = s == 0
            jp = j - 1
        in_chunk = jnp.logical_and(jp >= 0, jp < chunk)
        jc = jnp.clip(jp, 0, chunk - 1)
        c_prev = jnp.where(in_chunk, c_ref[jc], cp_ref[edge])
        c_prev = jnp.where(first, 0.0, c_prev)
        # c_ref[j] == c_new for every unmasked frame (mask freezes the
        # carry only PAST a row's length, where m zeroes the adjoint)
        return _dir_bwd_step(g4_ref[j], gh_ref[j], c_ref[j], c_prev, m,
                             dh, dc, whh, dxp_ref, db_ref, j)

    dh_carry[...], dc_carry[...] = jax.lax.fori_loop(
        0, chunk, body, (dh_carry[...], dc_carry[...]))


def _specs(T, B, H, chunk, rev, shift=0):
    """Block specs; ``shift`` offsets the block index (clamped in-range) —
    used for the boundary views of the stored trajectories."""
    n_chunks = T // chunk

    def idx(t):
        k = (n_chunks - 1 - t) if rev else t
        if shift:
            k = jnp.clip(k + shift, 0, n_chunks - 1)
        return (k, 0, 0)

    xp_spec = pl.BlockSpec((chunk, B, 4 * H), idx, memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((chunk, B, H), idx, memory_space=pltpu.VMEM)
    return xp_spec, h_spec, n_chunks


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda t: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _cast_weights(whh, compute_dtype):
    return whh.astype(compute_dtype) if whh.dtype != compute_dtype else whh


def _fwd_call(xp, whh, b2d, len_bc, rev):
    T, B, H4 = xp.shape
    H = H4 // 4
    whh_c = _cast_weights(whh, xp.dtype)
    su = jnp.dtype(xp.dtype).itemsize
    sw = jnp.dtype(whh_c.dtype).itemsize
    resident = H * 4 * H * sw + 2 * B * H * 4
    # pipeline blocks per timestep: xp in, y out, c out (f32), g4 out
    chunk = _lstm_chunk(B, H, 4 * su + su + 4 + 4 * su, resident)
    if T % chunk != 0:  # holds for power-of-two chunks from fit_chunk;
        # an if/raise (not assert) so the invariant survives python -O
        raise ValueError(f"T={T} not divisible by chunk={chunk}")
    xp_spec, h_spec, n_chunks = _specs(T, B, H, chunk, rev)
    kern = partial(_lstm_fwd_kernel, rev, chunk, n_chunks)
    return pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[xp_spec, _const_spec(whh_c.shape), _const_spec(b2d.shape),
                  _const_spec(len_bc.shape)],
        out_specs=[h_spec, h_spec, xp_spec],
        out_shape=[jax.ShapeDtypeStruct((T, B, H), xp.dtype),
                   jax.ShapeDtypeStruct((T, B, H), jnp.float32),
                   jax.ShapeDtypeStruct((T, B, 4 * H), xp.dtype)],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((B, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_FUSED_VMEM_LIMIT),
        interpret=not _on_tpu(),
    )(xp, whh_c, b2d, len_bc)


def _shifted_dwhh(y, dxp, layer_rev):
    """dW_hh = sum_t h_{t-1}^T @ dgates_t as ONE near-peak XLA matmul.

    h_{t-1} in FORWARD-traversal order is y[t-1] (zeros at the traversal
    start) for a forward layer and y[t+1] for a reverse layer; the
    boundary term is zero, so the shift drops one (y, dgates) pair
    instead of materializing a zero row.  Masked frames contribute
    nothing (their dgates rows are zeroed in-kernel)."""
    T, B, H = y.shape
    if layer_rev:
        h_prev, dg = y[1:], dxp[:T - 1]
    else:
        h_prev, dg = y[:T - 1], dxp[1:]
    return jnp.matmul(h_prev.reshape(-1, H).T,
                      dg.reshape((T - 1) * B, -1),
                      preferred_element_type=jnp.float32)


def _bwd_call(whh, len_bc, y, c, g4, gh, layer_rev):
    T, B, H = y.shape
    whh_c = _cast_weights(whh, g4.dtype)
    su = jnp.dtype(g4.dtype).itemsize
    sw = jnp.dtype(whh_c.dtype).itemsize
    sg = jnp.dtype(gh.dtype).itemsize
    # resident: whh + the f32 db output block + the adjoint carries
    resident = H * 4 * H * sw + 8 * 4 * H * 4 + 2 * B * H * 4
    # pipeline blocks per timestep: g4, dxp out (4H each), c x2 (f32), gh
    per_h = 4 * su + 4 * su + 2 * 4 + sg
    chunk = _lstm_chunk(B, H, per_h, resident)
    if T % chunk != 0:  # holds for power-of-two chunks from fit_chunk;
        # an if/raise (not assert) so the invariant survives python -O
        raise ValueError(f"T={T} not divisible by chunk={chunk}")
    rev = not layer_rev  # traverse opposite to the forward pass
    xp_spec, h_spec, n_chunks = _specs(T, B, H, chunk, rev)
    # boundary view: one block earlier in FORWARD-traversal order
    shift = +1 if layer_rev else -1
    _, hp_spec, _ = _specs(T, B, H, chunk, rev, shift=shift)
    kern = partial(_lstm_bwd_kernel, layer_rev, chunk, n_chunks)
    dxp, db = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[xp_spec, _const_spec(whh_c.shape),
                  _const_spec(len_bc.shape),
                  h_spec, hp_spec, h_spec],
        out_specs=[xp_spec, _const_spec((8, 4 * H))],
        out_shape=[jax.ShapeDtypeStruct((T, B, 4 * H), g4.dtype),
                   jax.ShapeDtypeStruct((8, 4 * H), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((B, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_FUSED_VMEM_LIMIT),
        interpret=not _on_tpu(),
    )(g4, whh_c, len_bc, c, c, gh)
    dwhh = _shifted_dwhh(y, dxp, layer_rev)
    return dxp, dwhh, db[0]


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_lstm_padded(xp, whh, b2d, len_bc, rev):
    y, _, _ = _fwd_call(xp, whh, b2d, len_bc, rev)
    return y


def _fused_lstm_fwd(xp, whh, b2d, len_bc, rev):
    y, c, g4 = _fwd_call(xp, whh, b2d, len_bc, rev)
    return y, (whh, b2d, len_bc, y, c, g4)


def _fused_lstm_bwd(rev, res, gh):
    whh, b2d, len_bc, y, c, g4 = res
    dxp, dwhh, db = _bwd_call(whh, len_bc, y, c, g4, gh, rev)
    db2d = jnp.zeros_like(b2d).at[0].set(db.astype(b2d.dtype))
    return dxp, dwhh.astype(whh.dtype), db2d, jnp.zeros_like(len_bc)


_fused_lstm_padded.defvjp(_fused_lstm_fwd, _fused_lstm_bwd)


# ===========================================================================
# Projection-fused LSTM FORWARD (round 4): the input projection
# xp = x @ W_ih runs INSIDE the kernel — W_ih joins W_hh as a VMEM
# resident, each grid step projects its (chunk, B, D) x-block on the MXU
# into a VMEM scratch block, and the recurrence consumes it in place
# (the backward consumes the stored GATES, so xp never reaches HBM).
# The backward stays split exactly like the SRU's (sru_scan.py section
# comment): the pinned BPTT kernel produces dxp (= dgates)/db, then
# dx = dxp @ W_ih^T, dW_ih = x^T @ dxp, and dW_hh = shifted-y^T @ dxp
# run as three big near-peak XLA matmuls.
# ===========================================================================

_PROJ_BUDGET = 48 * 1024 * 1024


def lstm_proj_feasible(B, D, H, compute_dtype):
    """True if the projection-fused forward fits the VMEM budget at the
    minimum chunk, ON TOP of the recurrence kernel's own feasibility
    (kernel_feasible)."""
    if not kernel_feasible(B, H, compute_dtype):
        return False
    Bp = _round_up(max(B, 1), 8)
    Dp = _round_up(max(D, 1), 128)
    Hp = _round_up(max(H, 1), 128)
    io = jnp.bfloat16 if jnp.dtype(compute_dtype) == jnp.bfloat16 \
        else jnp.float32
    s = jnp.dtype(io).itemsize
    resident = (Dp + Hp) * 4 * Hp * s + 2 * Bp * Hp * 4
    per_t = Bp * 2 * (Dp * s + Hp * s + 4 * Hp * s + Hp * 4) \
        + Bp * 4 * Hp * s
    return per_t + resident <= _PROJ_BUDGET


def _plstm_chunk(B, D, H, io_dtype):
    s = jnp.dtype(io_dtype).itemsize
    resident = (D + H) * 4 * H * s + 2 * B * H * 4
    # double-buffered pipeline lanes (x, y, g4, c) + the xp VMEM scratch
    per_t = B * 2 * (D * s + H * s + 4 * H * s + H * 4) + B * 4 * H * s
    chunk = _FUSED_MAX_CHUNK
    while chunk > 1 and chunk * per_t + resident > _PROJ_BUDGET:
        chunk //= 2
    return chunk


def _plstm_fwd_kernel(rev, chunk, n_chunks,
                      x_ref, wih_ref, whh_ref, b_ref, len_ref,
                      y_ref, c_ref, g4_ref, xp_scr, h_carry, c_carry):
    # Identical recurrence math to _lstm_fwd_kernel (pinned in
    # tests/test_kernels.py) with xp coming from the in-kernel projection
    # (VMEM scratch — the backward consumes the stored gates, so the
    # pre-activations never reach HBM).
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_carry[...] = jnp.zeros_like(h_carry)
        c_carry[...] = jnp.zeros_like(c_carry)

    xp_scr[...] = _proj_u(x_ref, wih_ref, xp_scr.dtype)
    lv = len_ref[...]
    f32 = jnp.float32
    block = (n_chunks - 1 - t) if rev else t
    whh = whh_ref[...]
    b_row = b_ref[0].astype(f32)

    def body(i_loop, carry):
        h, c = carry
        j = (chunk - 1 - i_loop) if rev else i_loop
        s = block * chunk + j
        m = (s < lv).astype(f32)
        return _dir_fwd_step(xp_scr[j], b_row, h, c, m, whh,
                             y_ref, c_ref, g4_ref, j)

    h_carry[...], c_carry[...] = jax.lax.fori_loop(
        0, chunk, body, (h_carry[...], c_carry[...]))


def _plstm_fwd_call(x, w_ih, w_hh, b2d, len_bc, rev):
    T, B, D = x.shape
    H = w_hh.shape[0]
    wih_c = _cast_weights(w_ih, x.dtype)
    whh_c = _cast_weights(w_hh, x.dtype)
    chunk = _plstm_chunk(B, D, H, x.dtype)
    if T % chunk != 0:
        raise ValueError(f"T={T} not divisible by chunk={chunk}")
    xp_spec, h_spec, n_chunks = _specs(T, B, H, chunk, rev)
    x_spec = pl.BlockSpec(
        (chunk, B, D),
        lambda t: ((n_chunks - 1 - t) if rev else t, 0, 0),
        memory_space=pltpu.VMEM)
    kern = partial(_plstm_fwd_kernel, rev, chunk, n_chunks)
    return pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[x_spec, _const_spec(wih_c.shape), _const_spec(whh_c.shape),
                  _const_spec(b2d.shape), _const_spec(len_bc.shape)],
        out_specs=[h_spec, h_spec, xp_spec],
        out_shape=[jax.ShapeDtypeStruct((T, B, H), x.dtype),
                   jax.ShapeDtypeStruct((T, B, H), jnp.float32),
                   jax.ShapeDtypeStruct((T, B, 4 * H), x.dtype)],
        scratch_shapes=[pltpu.VMEM((chunk, B, 4 * H), x.dtype),
                        pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((B, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_PROJ_VMEM_LIMIT),
        interpret=not _on_tpu(),
    )(x, wih_c, whh_c, b2d, len_bc)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def _plstm_padded(x, w_ih, w_hh, b2d, len_bc, rev):
    y, _, _ = _plstm_fwd_call(x, w_ih, w_hh, b2d, len_bc, rev)
    return y


def _plstm_fwd(x, w_ih, w_hh, b2d, len_bc, rev):
    y, c, g4 = _plstm_fwd_call(x, w_ih, w_hh, b2d, len_bc, rev)
    return y, (x, w_ih, w_hh, b2d, len_bc, y, c, g4)


def _plstm_bwd(rev, res, gh):
    x, w_ih, w_hh, b2d, len_bc, y, c, g4 = res
    dxp, dwhh, db = _bwd_call(w_hh, len_bc, y, c, g4, gh, rev)
    wih_c = _cast_weights(w_ih, x.dtype)
    T, B, D = x.shape
    dxp2 = dxp.reshape(T * B, -1)
    dx = jnp.matmul(dxp2, wih_c.T, preferred_element_type=jnp.float32)
    dx = dx.reshape(T, B, D).astype(x.dtype)
    x2 = x.reshape(T * B, D)
    dwih = jnp.matmul(x2.T, dxp2, preferred_element_type=jnp.float32)
    db2d = jnp.zeros_like(b2d).at[0].set(db.astype(b2d.dtype))
    return (dx, dwih.astype(w_ih.dtype), dwhh.astype(w_hh.dtype), db2d,
            jnp.zeros_like(len_bc))


_plstm_padded.defvjp(_plstm_fwd, _plstm_bwd)


def fused_lstm_proj_layer(x, w_ih, w_hh, bias, lengths, reverse=False,
                          compute_dtype="float32"):
    """One full LSTM layer direction from the RAW INPUT ``x`` — the input
    projection runs inside the kernel (W_ih resident in VMEM next to
    W_hh).  Numerically pinned to ``matmul_cast(x, w_ih, compute_dtype)``
    + :func:`fused_lstm_layer` in tests/test_kernels.py.

    x: (T, B, D) time-major; w_ih: (D, 4H) and w_hh: (H, 4H) in their
    PARAMETER dtype (f32 — weight cotangents stay f32, compute-dtype casts
    happen inside); bias: (4H,) summed b_ih + b_hh, added in-kernel.
    Returns y: (T, B, H) in the compute I/O dtype, padded frames zeroed.
    """
    T, B, D = x.shape
    H = w_hh.shape[0]
    cd = jnp.dtype(compute_dtype)
    io = jnp.bfloat16 if cd == jnp.bfloat16 else jnp.float32
    x = x.astype(io)
    Bp = _round_up(max(B, 1), 8)
    Dp = _round_up(max(D, 1), 128)
    Hp = _round_up(max(H, 1), 128)
    Tp = _round_up(max(T, 1), _FUSED_MAX_CHUNK)
    w_ih, w_hh, bias = _pad_lstm_weights(w_ih, w_hh, bias, D, H, Dp, Hp)
    if (Tp, Bp, Dp) != (T, B, D):
        x = jnp.pad(x, ((0, Tp - T), (0, Bp - B), (0, Dp - D)))
    len_bc = jnp.broadcast_to(
        jnp.asarray(lengths, jnp.float32)[:, None], (B, Hp))
    if Bp != B:
        len_bc = jnp.pad(len_bc, ((0, Bp - B), (0, 0)))
    b2d = jnp.broadcast_to(bias.astype(jnp.float32)[None, :], (8, 4 * Hp))
    y = _plstm_padded(x, w_ih, w_hh, b2d, len_bc, bool(reverse))
    return y[:T, :B, :H]


# ===========================================================================
# Bidirectional fused LSTM layer (round 5): BOTH directions of one biLSTM
# layer run in a single kernel.
#
# Why: at the shipped batch sizes (B=20 -> 24 padded rows of a 128-row MXU
# tile) the per-step recurrent matmul runs ~20% occupied, and within one
# direction it is strictly serialized against the VPU gate math (h_t needs
# gates_t needs matmul_t needs h_{t-1}).  The two directions are
# INDEPENDENT recurrences over the same input, so interleaving them in one
# fori_loop body gives the scheduler two dataflow chains: direction F's
# (B, H) x (H, 4H) matmul can run on the MXU while direction B's gate math
# occupies the VPU, collapsing the per-step critical path from
# 2*(matmul + gates) toward max(2*matmul, 2*gates).  (The round-4 VERDICT
# suggested one (2B, H) @ (H, 4H) matmul, but the directions have distinct
# W_hh — a shared-weight row-batch is algebraically unavailable, and a
# block-diagonal (B, 2H) @ (2H, 8H) QUADRUPLES the streamed weight tiles;
# overlap, not row-batching, is the available win.)
#
# Traversal: grid step t processes block t for the forward direction and
# block n_chunks-1-t for the reverse direction (each direction must see its
# own time order), so the input is read once per direction — the same HBM
# traffic as two kernels; the win is compute overlap plus one pipeline.
# The input projections for both directions run in-kernel (all four weight
# matrices VMEM-resident).  The backward fuses both directions' BPTT the
# same way; dW_hh/dW_ih/dx remain big near-peak XLA matmuls outside (the
# round-4 measured split, see the projection-fused section comment above),
# with the two directions' dxp concatenated so dx and dW_ih run as ONE
# (T*B, 8H)-wide matmul each.
#
# Numerics are identical per direction to the pinned single-direction
# kernels (same helpers, same f32 carries); equivalence is pinned in
# tests/test_kernels.py.
# ===========================================================================


def bilstm_proj_feasible(B, D, H, compute_dtype):
    """True if the bidirectional projection-fused kernel pair (forward and
    BPTT) fits the VMEM budget: both directions' W_ih/W_hh resident plus a
    chunk-1 double-buffered pipeline of the doubled lane set."""
    Bp = _round_up(max(B, 1), 8)
    Dp = _round_up(max(D, 1), 128)
    Hp = _round_up(max(H, 1), 128)
    io = jnp.bfloat16 if jnp.dtype(compute_dtype) == jnp.bfloat16 \
        else jnp.float32
    s = jnp.dtype(io).itemsize
    # forward: residents 2x(W_ih + W_hh) + 4 f32 carries; per-t lanes
    # 2x(x, y, g4, c-f32) double-buffered + 2 un-pipelined xp scratch
    fwd_resident = 2 * (Dp + Hp) * 4 * Hp * s + 4 * Bp * Hp * 4
    fwd_per_t = 2 * (Bp * 2 * (Dp * s + Hp * s + 4 * Hp * s + Hp * 4)
                     + Bp * 4 * Hp * s)
    if fwd_per_t + fwd_resident > _PROJ_BUDGET:
        return False
    # backward: residents 2x(W_hh + db block) + 4 f32 adjoint carries;
    # per-t lanes 2x(g4, dxp, c, cp, gh)
    bwd_resident = 2 * (Hp * 4 * Hp * s + 8 * 4 * Hp * 4) + 4 * Bp * Hp * 4
    # per-row lane bytes: g4 + dxp (4H io each) + c, cp (f32, Hp each) + gh
    bwd_per_t = 2 * Bp * 2 * (4 * Hp * s + 4 * Hp * s + 2 * Hp * 4 + Hp * s)
    return bwd_per_t + bwd_resident <= _PROJ_BUDGET


def _bilstm_fwd_chunk(B, D, H, io_dtype):
    s = jnp.dtype(io_dtype).itemsize
    resident = 2 * (D + H) * 4 * H * s + 4 * B * H * 4
    per_t = 2 * (B * 2 * (D * s + H * s + 4 * H * s + H * 4) + B * 4 * H * s)
    chunk = _FUSED_MAX_CHUNK
    while chunk > 1 and chunk * per_t + resident > _PROJ_BUDGET:
        chunk //= 2
    return chunk


def _bilstm_bwd_chunk(B, H, su, sw, sg):
    resident = 2 * (H * 4 * H * sw + 8 * 4 * H * 4) + 4 * B * H * 4
    per_h = 2 * (4 * su + 4 * su + 2 * 4 + sg)
    return _lstm_chunk(B, H, per_h, resident)


def _bilstm_fwd_kernel(chunk, n_chunks,
                       xf_ref, xb_ref, wihf_ref, wihb_ref,
                       whhf_ref, whhb_ref, bf_ref, bb_ref, len_ref,
                       yf_ref, cf_ref, g4f_ref, yb_ref, cb_ref, g4b_ref,
                       xpf_scr, xpb_scr, hf_c, cf_c, hb_c, cb_c):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        hf_c[...] = jnp.zeros_like(hf_c)
        cf_c[...] = jnp.zeros_like(cf_c)
        hb_c[...] = jnp.zeros_like(hb_c)
        cb_c[...] = jnp.zeros_like(cb_c)

    xpf_scr[...] = _proj_u(xf_ref, wihf_ref, xpf_scr.dtype)
    xpb_scr[...] = _proj_u(xb_ref, wihb_ref, xpb_scr.dtype)
    lv = len_ref[...]
    f32 = jnp.float32
    blk_f = t
    blk_b = n_chunks - 1 - t
    whf = whhf_ref[...]
    whb = whhb_ref[...]
    brf = bf_ref[0].astype(f32)
    brb = bb_ref[0].astype(f32)

    def body(i, carry):
        hf, cf, hb, cb = carry
        jf = i
        jb = chunk - 1 - i
        mf = ((blk_f * chunk + jf) < lv).astype(f32)
        mb = ((blk_b * chunk + jb) < lv).astype(f32)
        hf, cf = _dir_fwd_step(xpf_scr[jf], brf, hf, cf, mf, whf,
                               yf_ref, cf_ref, g4f_ref, jf)
        hb, cb = _dir_fwd_step(xpb_scr[jb], brb, hb, cb, mb, whb,
                               yb_ref, cb_ref, g4b_ref, jb)
        return hf, cf, hb, cb

    hf_c[...], cf_c[...], hb_c[...], cb_c[...] = jax.lax.fori_loop(
        0, chunk, body, (hf_c[...], cf_c[...], hb_c[...], cb_c[...]))


def _bilstm_bwd_kernel(chunk, n_chunks,
                       g4f_ref, g4b_ref, whhf_ref, whhb_ref, len_ref,
                       cf_ref, cpf_ref, cb_ref, cpb_ref, ghf_ref, ghb_ref,
                       dxpf_ref, dxpb_ref, dbf_ref, dbb_ref,
                       dhf_c, dcf_c, dhb_c, dcb_c):
    # F's adjoint traverses reverse time (block n_chunks-1-t, j descending);
    # B's adjoint traverses forward time (block t, j ascending) — the same
    # grid carries both, mirroring the forward kernel's pairing.
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dhf_c[...] = jnp.zeros_like(dhf_c)
        dcf_c[...] = jnp.zeros_like(dcf_c)
        dhb_c[...] = jnp.zeros_like(dhb_c)
        dcb_c[...] = jnp.zeros_like(dcb_c)
        dbf_ref[...] = jnp.zeros_like(dbf_ref)
        dbb_ref[...] = jnp.zeros_like(dbb_ref)

    lv = len_ref[...]
    f32 = jnp.float32
    blk_f = n_chunks - 1 - t   # F adjoint's block (reverse traversal)
    blk_b = t                  # B adjoint's block (forward traversal)
    whf = whhf_ref[...]
    whb = whhb_ref[...]
    T_total = n_chunks * chunk

    def body(i, carry):
        dhf, dcf, dhb, dcb = carry
        # --- forward-layer adjoint: j descending, c_prev at s-1 ---
        jf = chunk - 1 - i
        sf = blk_f * chunk + jf
        mf = (sf < lv).astype(f32)
        in_chunk_f = jf - 1 >= 0
        c_prev_f = jnp.where(in_chunk_f,
                             cf_ref[jnp.clip(jf - 1, 0, chunk - 1)],
                             cpf_ref[chunk - 1])
        c_prev_f = jnp.where(sf == 0, 0.0, c_prev_f)
        dhf, dcf = _dir_bwd_step(g4f_ref[jf], ghf_ref[jf], cf_ref[jf],
                                 c_prev_f, mf, dhf, dcf, whf,
                                 dxpf_ref, dbf_ref, jf)
        # --- reverse-layer adjoint: j ascending, c_prev at s+1 ---
        jb = i
        sb = blk_b * chunk + jb
        mb = (sb < lv).astype(f32)
        in_chunk_b = jb + 1 < chunk
        c_prev_b = jnp.where(in_chunk_b,
                             cb_ref[jnp.clip(jb + 1, 0, chunk - 1)],
                             cpb_ref[0])
        c_prev_b = jnp.where(sb == T_total - 1, 0.0, c_prev_b)
        dhb, dcb = _dir_bwd_step(g4b_ref[jb], ghb_ref[jb], cb_ref[jb],
                                 c_prev_b, mb, dhb, dcb, whb,
                                 dxpb_ref, dbb_ref, jb)
        return dhf, dcf, dhb, dcb

    dhf_c[...], dcf_c[...], dhb_c[...], dcb_c[...] = jax.lax.fori_loop(
        0, chunk, body, (dhf_c[...], dcf_c[...], dhb_c[...], dcb_c[...]))


def _bilstm_fwd_call(x, wihf, whhf, bf2d, wihb, whhb, bb2d, len_bc):
    T, B, D = x.shape
    H = whhf.shape[0]
    wihf_c = _cast_weights(wihf, x.dtype)
    wihb_c = _cast_weights(wihb, x.dtype)
    whhf_c = _cast_weights(whhf, x.dtype)
    whhb_c = _cast_weights(whhb, x.dtype)
    chunk = _bilstm_fwd_chunk(B, D, H, x.dtype)
    if T % chunk != 0:
        raise ValueError(f"T={T} not divisible by chunk={chunk}")
    n_chunks = T // chunk

    def idx_f(t):
        return (t, 0, 0)

    def idx_b(t):
        return (n_chunks - 1 - t, 0, 0)

    xf_spec = pl.BlockSpec((chunk, B, D), idx_f, memory_space=pltpu.VMEM)
    xb_spec = pl.BlockSpec((chunk, B, D), idx_b, memory_space=pltpu.VMEM)
    hf_spec = pl.BlockSpec((chunk, B, H), idx_f, memory_space=pltpu.VMEM)
    hb_spec = pl.BlockSpec((chunk, B, H), idx_b, memory_space=pltpu.VMEM)
    g4f_spec = pl.BlockSpec((chunk, B, 4 * H), idx_f,
                            memory_space=pltpu.VMEM)
    g4b_spec = pl.BlockSpec((chunk, B, 4 * H), idx_b,
                            memory_space=pltpu.VMEM)
    kern = partial(_bilstm_fwd_kernel, chunk, n_chunks)
    io = x.dtype
    return pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[xf_spec, xb_spec,
                  _const_spec(wihf_c.shape), _const_spec(wihb_c.shape),
                  _const_spec(whhf_c.shape), _const_spec(whhb_c.shape),
                  _const_spec(bf2d.shape), _const_spec(bb2d.shape),
                  _const_spec(len_bc.shape)],
        out_specs=[hf_spec, hf_spec, g4f_spec, hb_spec, hb_spec, g4b_spec],
        out_shape=[jax.ShapeDtypeStruct((T, B, H), io),
                   jax.ShapeDtypeStruct((T, B, H), jnp.float32),
                   jax.ShapeDtypeStruct((T, B, 4 * H), io),
                   jax.ShapeDtypeStruct((T, B, H), io),
                   jax.ShapeDtypeStruct((T, B, H), jnp.float32),
                   jax.ShapeDtypeStruct((T, B, 4 * H), io)],
        scratch_shapes=[pltpu.VMEM((chunk, B, 4 * H), io),
                        pltpu.VMEM((chunk, B, 4 * H), io),
                        pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((B, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_PROJ_VMEM_LIMIT),
        interpret=not _on_tpu(),
    )(x, x, wihf_c, wihb_c, whhf_c, whhb_c, bf2d, bb2d, len_bc)


def _bilstm_bwd_call(whhf, whhb, len_bc, yf, cf, g4f, yb, cb, g4b,
                     ghf, ghb):
    T, B, H = yf.shape
    whhf_c = _cast_weights(whhf, g4f.dtype)
    whhb_c = _cast_weights(whhb, g4b.dtype)
    su = jnp.dtype(g4f.dtype).itemsize
    sw = jnp.dtype(whhf_c.dtype).itemsize
    sg = jnp.dtype(ghf.dtype).itemsize
    chunk = _bilstm_bwd_chunk(B, H, su, sw, sg)
    if T % chunk != 0:
        raise ValueError(f"T={T} not divisible by chunk={chunk}")
    n_chunks = T // chunk

    def mk(shift_dir):
        # F adjoint walks blocks in reverse order; B adjoint forward.
        def idx(t):
            k = (n_chunks - 1 - t) if shift_dir == "f" else t
            return (k, 0, 0)

        return idx

    def mk_shift(base, shift):
        def idx(t):
            k = base(t)[0]
            return (jnp.clip(k + shift, 0, n_chunks - 1), 0, 0)

        return idx

    idx_f, idx_b = mk("f"), mk("b")
    hf_spec = pl.BlockSpec((chunk, B, H), idx_f, memory_space=pltpu.VMEM)
    hb_spec = pl.BlockSpec((chunk, B, H), idx_b, memory_space=pltpu.VMEM)
    # boundary views: one block earlier in each direction's FORWARD
    # traversal order (previous block for F, next block for B)
    hpf_spec = pl.BlockSpec((chunk, B, H), mk_shift(idx_f, -1),
                            memory_space=pltpu.VMEM)
    hpb_spec = pl.BlockSpec((chunk, B, H), mk_shift(idx_b, +1),
                            memory_space=pltpu.VMEM)
    g4f_spec = pl.BlockSpec((chunk, B, 4 * H), idx_f,
                            memory_space=pltpu.VMEM)
    g4b_spec = pl.BlockSpec((chunk, B, 4 * H), idx_b,
                            memory_space=pltpu.VMEM)
    kern = partial(_bilstm_bwd_kernel, chunk, n_chunks)
    dxpf, dxpb, dbf, dbb = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[g4f_spec, g4b_spec,
                  _const_spec(whhf_c.shape), _const_spec(whhb_c.shape),
                  _const_spec(len_bc.shape),
                  hf_spec, hpf_spec, hb_spec, hpb_spec,
                  hf_spec, hb_spec],
        out_specs=[g4f_spec, g4b_spec,
                   _const_spec((8, 4 * H)), _const_spec((8, 4 * H))],
        out_shape=[jax.ShapeDtypeStruct((T, B, 4 * H), g4f.dtype),
                   jax.ShapeDtypeStruct((T, B, 4 * H), g4b.dtype),
                   jax.ShapeDtypeStruct((8, 4 * H), jnp.float32),
                   jax.ShapeDtypeStruct((8, 4 * H), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((B, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_PROJ_VMEM_LIMIT),
        interpret=not _on_tpu(),
    )(g4f, g4b, whhf_c, whhb_c, len_bc, cf, cf, cb, cb, ghf, ghb)
    dwhhf = _shifted_dwhh(yf, dxpf, False)
    dwhhb = _shifted_dwhh(yb, dxpb, True)
    return dxpf, dxpb, dwhhf, dwhhb, dbf[0], dbb[0]


@jax.custom_vjp
def _bilstm_padded(x, wihf, whhf, bf2d, wihb, whhb, bb2d, len_bc):
    yf, _, _, yb, _, _ = _bilstm_fwd_call(x, wihf, whhf, bf2d,
                                          wihb, whhb, bb2d, len_bc)
    return yf, yb


def _bilstm_vjp_fwd(x, wihf, whhf, bf2d, wihb, whhb, bb2d, len_bc):
    yf, cf, g4f, yb, cb, g4b = _bilstm_fwd_call(x, wihf, whhf, bf2d,
                                                wihb, whhb, bb2d, len_bc)
    return (yf, yb), (x, wihf, whhf, bf2d, wihb, whhb, bb2d, len_bc,
                      yf, cf, g4f, yb, cb, g4b)


def _bilstm_vjp_bwd(res, gh):
    (x, wihf, whhf, bf2d, wihb, whhb, bb2d, len_bc,
     yf, cf, g4f, yb, cb, g4b) = res
    ghf, ghb = gh
    dxpf, dxpb, dwhhf, dwhhb, dbf, dbb = _bilstm_bwd_call(
        whhf, whhb, len_bc, yf, cf, g4f, yb, cb, g4b,
        ghf.astype(g4f.dtype), ghb.astype(g4b.dtype))
    T, B, D = x.shape
    # dx and dW_ih as single (8H)-wide matmuls over both directions
    dxp_cat = jnp.concatenate([dxpf, dxpb], axis=-1).reshape(T * B, -1)
    wih_cat = jnp.concatenate([_cast_weights(wihf, x.dtype),
                               _cast_weights(wihb, x.dtype)], axis=-1)
    dx = jnp.matmul(dxp_cat, wih_cat.T,
                    preferred_element_type=jnp.float32)
    dx = dx.reshape(T, B, D).astype(x.dtype)
    x2 = x.reshape(T * B, D)
    dwih_cat = jnp.matmul(x2.T, dxp_cat,
                          preferred_element_type=jnp.float32)
    H4 = dxpf.shape[-1]
    dwihf = dwih_cat[:, :H4].astype(wihf.dtype)
    dwihb = dwih_cat[:, H4:].astype(wihb.dtype)
    dbf2d = jnp.zeros_like(bf2d).at[0].set(dbf.astype(bf2d.dtype))
    dbb2d = jnp.zeros_like(bb2d).at[0].set(dbb.astype(bb2d.dtype))
    return (dx, dwihf, dwhhf.astype(whhf.dtype), dbf2d,
            dwihb, dwhhb.astype(whhb.dtype), dbb2d,
            jnp.zeros_like(len_bc))


_bilstm_padded.defvjp(_bilstm_vjp_fwd, _bilstm_vjp_bwd)


def _pad_lstm_weights(w_ih, w_hh, bias, D, H, Dp, Hp):
    if Hp != H:
        w_ih = jnp.pad(w_ih.reshape(D, 4, H),
                       ((0, 0), (0, 0), (0, Hp - H))).reshape(D, 4 * Hp)
        w_hh = jnp.pad(w_hh.reshape(H, 4, H),
                       ((0, Hp - H), (0, 0), (0, Hp - H))
                       ).reshape(Hp, 4 * Hp)
        bias = jnp.pad(bias.reshape(4, H), ((0, 0), (0, Hp - H))).reshape(-1)
    if Dp != D:
        w_ih = jnp.pad(w_ih, ((0, Dp - D), (0, 0)))
    return w_ih, w_hh, bias


def fused_bilstm_proj_layer(x, params_fwd, params_bwd, lengths,
                            compute_dtype="float32"):
    """One full BIDIRECTIONAL LSTM layer from the raw input ``x`` in a
    single fused kernel (both input projections in-kernel, both
    recurrences interleaved in one grid).  ``params_fwd``/``params_bwd``
    are dicts with ``w_ih`` (D, 4H), ``w_hh`` (H, 4H) and ``bias`` (4H,)
    in their PARAMETER dtype.  Returns ``(y_fwd, y_bwd)``, each
    (T, B, H) in the compute I/O dtype with padded frames zeroed —
    numerically pinned per direction to :func:`fused_lstm_proj_layer`
    in tests/test_kernels.py."""
    T, B, D = x.shape
    H = params_fwd["w_hh"].shape[0]
    cd = jnp.dtype(compute_dtype)
    io = jnp.bfloat16 if cd == jnp.bfloat16 else jnp.float32
    x = x.astype(io)
    Bp = _round_up(max(B, 1), 8)
    Dp = _round_up(max(D, 1), 128)
    Hp = _round_up(max(H, 1), 128)
    Tp = _round_up(max(T, 1), _FUSED_MAX_CHUNK)
    wihf, whhf, bf = _pad_lstm_weights(
        params_fwd["w_ih"], params_fwd["w_hh"], params_fwd["bias"],
        D, H, Dp, Hp)
    wihb, whhb, bb = _pad_lstm_weights(
        params_bwd["w_ih"], params_bwd["w_hh"], params_bwd["bias"],
        D, H, Dp, Hp)
    if (Tp, Bp, Dp) != (T, B, D):
        x = jnp.pad(x, ((0, Tp - T), (0, Bp - B), (0, Dp - D)))
    len_bc = jnp.broadcast_to(
        jnp.asarray(lengths, jnp.float32)[:, None], (B, Hp))
    if Bp != B:
        len_bc = jnp.pad(len_bc, ((0, Bp - B), (0, 0)))
    bf2d = jnp.broadcast_to(bf.astype(jnp.float32)[None, :], (8, 4 * Hp))
    bb2d = jnp.broadcast_to(bb.astype(jnp.float32)[None, :], (8, 4 * Hp))
    yf, yb = _bilstm_padded(x, wihf, whhf, bf2d, wihb, whhb, bb2d, len_bc)
    return yf[:T, :B, :H], yb[:T, :B, :H]


def fused_lstm_layer(xp, w_hh, bias, lengths, reverse=False):
    """One full LSTM layer direction from pre-activations ``xp = x @ W_ih``.

    xp: (T, B, 4H) time-major (torch gate order i, f, g, o), in the compute
    dtype (bf16 I/O when the config runs bf16); w_hh: (H, 4H) in its
    PARAMETER dtype (f32 — cotangent stays f32, the compute-dtype cast
    happens inside); bias: (4H,) — the summed b_ih + b_hh, added IN-KERNEL
    (gradient accumulated in-kernel too); lengths: (B,) int.  ``reverse``
    runs the recurrence right-to-left via index maps (no flip
    materialization).  Returns h: (T, B, H) in xp's dtype with padded
    frames zeroed.
    """
    T, B, H4 = xp.shape
    H = H4 // 4
    Bp = _round_up(max(B, 1), 8)
    Hp = _round_up(max(H, 1), 128)
    Tp = _round_up(max(T, 1), _FUSED_MAX_CHUNK)
    if Hp != H:
        xp = jnp.pad(xp.reshape(T, B, 4, H),
                     ((0, 0), (0, 0), (0, 0), (0, Hp - H))
                     ).reshape(T, B, 4 * Hp)
        w_hh = jnp.pad(w_hh.reshape(H, 4, H),
                       ((0, Hp - H), (0, 0), (0, Hp - H))
                       ).reshape(Hp, 4 * Hp)
        bias = jnp.pad(bias.reshape(4, H), ((0, 0), (0, Hp - H))).reshape(-1)
    if (Tp, Bp) != (T, B):
        xp = jnp.pad(xp, ((0, Tp - T), (0, Bp - B), (0, 0)))
    len_bc = jnp.broadcast_to(
        jnp.asarray(lengths, jnp.float32)[:, None], (B, Hp))
    if Bp != B:
        len_bc = jnp.pad(len_bc, ((0, Bp - B), (0, 0)))
    b2d = jnp.broadcast_to(bias.astype(jnp.float32)[None, :], (8, 4 * Hp))
    y = _fused_lstm_padded(xp, w_hh, b2d, len_bc, bool(reverse))
    return y[:T, :B, :H]
