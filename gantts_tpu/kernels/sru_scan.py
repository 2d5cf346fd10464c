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

# The FUSED layer kernels run with an explicitly raised Mosaic scoped-vmem
# cap (the v5e has 128 MB of VMEM; the default ~16 MB cap is far below the
# hardware — probed in round 4), so they size their chunk against a much
# larger budget.  Fewer, bigger grid steps mean fewer pipeline stalls
# between chunks of the sequential scan (measured on the v5e this round).
_FUSED_MAX_CHUNK = 16
_FUSED_BUDGET = 48 * 1024 * 1024
_FUSED_VMEM_LIMIT = 100 * 1024 * 1024


def fit_chunk(per_h_bytes, B, H, resident_bytes=0, budget=_VMEM_BUDGET,
              max_chunk=_MAX_CHUNK):
    """Largest power-of-two timestep chunk (<= max_chunk) that fits VMEM.

    Per grid step the pipeline double-buffers (x2) every (chunk, B, H*k)
    block — ``per_h_bytes`` sums the bytes of all H-wide lanes held per
    timestep — plus any grid-resident scratch (``resident_bytes``, e.g. a
    VMEM-resident W_hh).  Oversized blocks fail at compile time with a
    Mosaic scoped-vmem OOM (seen at B=96, H=512, chunk=16), so every
    kernel in this package sizes its chunk through this one budget.
    """
    chunk = max_chunk
    while chunk > 1 and (2 * chunk * B * H * per_h_bytes + resident_bytes
                         > budget):
        chunk //= 2
    return chunk


def _pick_chunk(B, H, dtype_bytes=4):
    # plain linear-recurrence kernel: three (chunk, B, H) blocks per step
    return fit_chunk(3 * dtype_bytes, B, H)


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


# ===========================================================================
# Fused SRU layer kernel: gates + masking + recurrence + highway output in
# ONE pass over HBM.
#
# The unfused layer (models/sru.py fallback) moves ~18 (B,T,H)-sized arrays
# through HBM per layer/direction (gate sigmoids, masked f/b, scan in/out,
# highway combine); this kernel reads u = x@W + bias once (4H), reads the
# per-row length vector, and writes h, c, c_prev (3H) — with the recurrence
# carry living in VMEM scratch across grid steps.  Direction is handled by
# the index maps (reverse traversal), so the bidirectional path needs NO
# time-flip materialization at all.
#
# Masking is computed in-kernel from a (B, H)-broadcast float length vector:
# frame s is valid iff s < length[b].  Padded frames behave as identity
# (f=1, input 0) and emit h=0, matching models/sru.py exactly.
# ===========================================================================


def _chunk_mask(chunk, block, lv):
    """(chunk, B, H) validity mask: global step s = block*chunk + j vs the
    per-row length broadcast lv (B, H).  Mosaic's tpu.iota is
    integer-only; cast after the offset add."""
    steps = (jax.lax.broadcasted_iota(jnp.int32, (chunk, 1, 1), 0)
             + block * chunk).astype(jnp.float32)
    return (steps < lv[None, :, :]).astype(jnp.float32)


def _fused_fwd_kernel(rev, use_relu, chunk, n_chunks,
                      u_ref, b_ref, len_ref, h_ref, c_ref, cb_ref,
                      carry_ref, fm_ref, bm_ref):
    # I/O may be bf16 (u, h follow the compute dtype); all math runs f32 in
    # registers, and the recurrence state (c, carry) is always f32.
    # The pre-update state c_{prev} is NOT materialized per timestep: the
    # backward kernel reconstructs it from the c block (shift by one in
    # traversal order) plus ``cb`` — the (n_chunks, B, H) carry entering
    # each chunk, written once per grid step.  Dropping the full cp array
    # saves a (T, B, H) f32 write forward and most of its read backward.
    #
    # Structure: everything WITHOUT a sequential dependence (gate sigmoids,
    # masking, the highway output combine) runs VECTORIZED over the whole
    # chunk before/after the scan; the serial fori_loop is only the
    # irreducible two-op recurrence c = fm*c + bm.  Same per-element
    # arithmetic as the per-timestep form (pinned in tests/test_kernels.py)
    # — the VPU just executes it as chunk-wide ops instead of ~50 small
    # serialized ops per timestep.
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    cb_ref[0] = carry_ref[...]  # carry entering this chunk (f32)
    lv = len_ref[...]  # (B, H) float: per-row valid length
    H = carry_ref.shape[-1]
    block = (n_chunks - 1 - t) if rev else t
    f32 = jnp.float32
    bf = b_ref[0, H:2 * H].astype(f32)       # f-gate bias (bias add lives
    br = b_ref[0, 2 * H:3 * H].astype(f32)   # in-kernel: no u+bias pass)

    # ---- vectorized pre-scan: masked gate/input terms for the chunk ----
    m = _chunk_mask(chunk, block, lv)
    f = jax.nn.sigmoid(u_ref[:, :, H:2 * H].astype(f32) + bf)
    fm_ref[...] = f * m + (1.0 - m)
    bm_ref[...] = (1.0 - f) * u_ref[:, :, 0:H].astype(f32) * m

    def body(i, c):
        j = (chunk - 1 - i) if rev else i
        c = fm_ref[j] * c + bm_ref[j]
        c_ref[j] = c
        return c

    carry_ref[...] = jax.lax.fori_loop(0, chunk, body, carry_ref[...])

    # ---- vectorized post-scan: highway output over the chunk ----
    r = jax.nn.sigmoid(u_ref[:, :, 2 * H:3 * H].astype(f32) + br)
    c_all = c_ref[...]
    g = jnp.maximum(c_all, 0.0) if use_relu else jnp.tanh(c_all)
    x_p = u_ref[:, :, 3 * H:4 * H].astype(f32)
    h_ref[...] = ((r * g + (1.0 - r) * x_p) * m).astype(h_ref.dtype)


def _fused_bwd_kernel(rev, use_relu, chunk, n_chunks,
                      u_ref, b_ref, len_ref, c_ref, cb_ref, gh_ref, du_ref,
                      db_ref, ghat_ref, fm_ref, db_acc, a_ref, fmc_ref,
                      gs_ref):
    # Traverses the OPPOSITE direction of the forward pass; `rev` here is
    # the traversal's own reversal flag (i.e. rev == not layer.reverse).
    # The forward's pre-update state cp is reconstructed in-block: in the
    # forward traversal order, cp[j] is the previous c within the chunk,
    # and at the chunk's first forward-traversal step it is cb[block]
    # (the carry the forward kernel recorded on chunk entry).
    #
    # Structure mirrors the forward: the gate/derivative terms and all four
    # du blocks are VECTORIZED over the chunk; the serial fori_loop carries
    # only the irreducible ghat recurrence ghat_j = a_j + fm_next * ghat
    # (a_j = gh*m*r*g' precomputed, fm from the scratch block).  Same
    # per-element arithmetic as the per-timestep form; the bias-gradient
    # accumulation becomes one chunk-wide reduction per grid step.
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        ghat_ref[...] = jnp.zeros_like(ghat_ref)
        fm_ref[...] = jnp.zeros_like(fm_ref)
        db_acc[...] = jnp.zeros_like(db_acc)

    lv = len_ref[...]
    H = ghat_ref.shape[-1]
    block = (n_chunks - 1 - t) if rev else t
    f32 = jnp.float32
    bf = b_ref[0, H:2 * H].astype(f32)
    br = b_ref[0, 2 * H:3 * H].astype(f32)
    cb0 = cb_ref[0]

    # ---- vectorized pre-scan over the chunk ----
    m = _chunk_mask(chunk, block, lv)
    f = jax.nn.sigmoid(u_ref[:, :, H:2 * H].astype(f32) + bf)
    r = jax.nn.sigmoid(u_ref[:, :, 2 * H:3 * H].astype(f32) + br)
    c = c_ref[...]
    if use_relu:
        g = jnp.maximum(c, 0.0)
        gp = (c > 0.0).astype(f32)
    else:
        g = jnp.tanh(c)
        gp = 1.0 - g * g
    gh = gh_ref[...].astype(f32)
    a_ref[...] = gh * m * r * gp
    fmc_ref[...] = f * m + (1.0 - m)

    def body(i, carry):
        ghat, fm_next = carry
        j = (chunk - 1 - i) if rev else i
        ghat = a_ref[j] + fm_next * ghat
        gs_ref[j] = ghat
        return ghat, fmc_ref[j]

    ghat_ref[...], fm_ref[...] = jax.lax.fori_loop(
        0, chunk, body, (ghat_ref[...], fm_ref[...]))

    # ---- vectorized post-scan: du blocks + bias-gradient reduction ----
    if rev:
        # layer runs forward in time (bwd traversal is reversed):
        # cp[j] = c[j-1], except j == 0 -> chunk-entry carry
        cp = jnp.concatenate([cb0[None], c[:-1]], axis=0)
    else:
        # layer runs reversed: cp[j] = c[j+1], except j == chunk-1
        cp = jnp.concatenate([c[1:], cb0[None]], axis=0)
    ghat = gs_ref[...]
    od = du_ref.dtype
    du_f = m * ghat * (cp - u_ref[:, :, 0:H].astype(f32)) * f * (1.0 - f)
    du_r = gh * m * (g - u_ref[:, :, 3 * H:4 * H].astype(f32)) \
        * r * (1.0 - r)
    du_ref[:, :, 0:H] = (ghat * (1.0 - f) * m).astype(od)
    du_ref[:, :, H:2 * H] = du_f.astype(od)
    du_ref[:, :, 2 * H:3 * H] = du_r.astype(od)
    du_ref[:, :, 3 * H:4 * H] = (gh * (1.0 - r) * m).astype(od)
    # bias gradients accumulated in VMEM across the whole grid — saves
    # the full-du re-read an external sum would cost
    db_acc[0, H:2 * H] += jnp.sum(du_f, axis=(0, 1))
    db_acc[0, 2 * H:3 * H] += jnp.sum(du_r, axis=(0, 1))

    @pl.when(t == n_chunks - 1)
    def _():
        db_ref[...] = db_acc[...]


def _fused_specs(T, B, H, chunk, rev):
    n_chunks = T // chunk

    def idx(t):
        return ((n_chunks - 1 - t) if rev else t, 0, 0)

    u_spec = pl.BlockSpec((chunk, B, 4 * H), idx, memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((chunk, B, H), idx, memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((B, H), lambda t: (0, 0),
                            memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((8, 4 * H), lambda t: (0, 0),
                          memory_space=pltpu.VMEM)
    # per-chunk boundary carries, stored by LAYER-TIME block index
    cb_spec = pl.BlockSpec(
        (1, B, H), (lambda t: ((n_chunks - 1 - t) if rev else t, 0, 0)),
        memory_space=pltpu.VMEM)
    return u_spec, h_spec, len_spec, b_spec, cb_spec, n_chunks


def _fused_per_h(u_dtype):
    """Per-timestep VMEM bytes per H lane for the fused-layer kernels.

    The FWD and BWD kernels must agree on the chunk (the per-chunk
    boundary-carry array ``cb`` is laid out at the forward's chunking), so
    both size against the larger (backward) footprint: u (4 lanes) + c
    (f32) + gh + du (4 lanes), all non-f32 lanes at the u itemsize, plus
    the three chunk-sized f32 scratch blocks of the vectorized-scan form
    (not pipelined/double-buffered, so they count at half weight under
    fit_chunk's 2x).  bf16 I/O roughly doubles the feasible chunk (fewer
    serial grid steps).
    """
    su = jnp.dtype(u_dtype).itemsize
    return 9 * su + 4 + 6


def _fused_chunk(B, H, per_h_bytes):
    return fit_chunk(per_h_bytes, B, H, budget=_FUSED_BUDGET,
                     max_chunk=_FUSED_MAX_CHUNK)


def _fused_fwd_call(u, b2d, len_bc, rev, use_relu):
    T, B, H4 = u.shape
    H = H4 // 4
    chunk = _fused_chunk(B, H, _fused_per_h(u.dtype))
    if T % chunk:
        raise ValueError(f"T={T} not divisible by chunk={chunk}")
    u_spec, h_spec, len_spec, b_spec, cb_spec, n_chunks = _fused_specs(
        T, B, H, chunk, rev)
    from functools import partial

    kern = partial(_fused_fwd_kernel, rev, use_relu, chunk, n_chunks)
    out_shape = [jax.ShapeDtypeStruct((T, B, H), u.dtype),
                 jax.ShapeDtypeStruct((T, B, H), jnp.float32),
                 jax.ShapeDtypeStruct((n_chunks, B, H), jnp.float32)]
    return pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[u_spec, b_spec, len_spec],
        out_specs=[h_spec, h_spec, cb_spec],
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((chunk, B, H), jnp.float32),
                        pltpu.VMEM((chunk, B, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_FUSED_VMEM_LIMIT),
        interpret=not _on_tpu(),
    )(u, b2d, len_bc)


def _fused_bwd_call(u, b2d, len_bc, c, cb, gh, rev_layer, use_relu):
    T, B, H4 = u.shape
    H = H4 // 4
    gh = gh.astype(u.dtype)  # cotangent of h; h shares u's dtype
    chunk = _fused_chunk(B, H, _fused_per_h(u.dtype))
    rev = not rev_layer  # traverse opposite to the forward direction
    u_spec, h_spec, len_spec, b_spec, cb_spec, n_chunks = _fused_specs(
        T, B, H, chunk, rev)
    if cb.shape[0] != n_chunks:
        raise ValueError(  # cannot happen: fwd/bwd share _fused_per_h
            f"chunk-boundary carry count {cb.shape[0]} != {n_chunks}")
    from functools import partial

    kern = partial(_fused_bwd_kernel, rev, use_relu, chunk, n_chunks)
    du, db = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[u_spec, b_spec, len_spec, h_spec, cb_spec, h_spec],
        out_specs=[u_spec, b_spec],
        out_shape=[jax.ShapeDtypeStruct((T, B, 4 * H), u.dtype),
                   jax.ShapeDtypeStruct((8, 4 * H), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((8, 4 * H), jnp.float32),
                        pltpu.VMEM((chunk, B, H), jnp.float32),
                        pltpu.VMEM((chunk, B, H), jnp.float32),
                        pltpu.VMEM((chunk, B, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_FUSED_VMEM_LIMIT),
        interpret=not _on_tpu(),
    )(u, b2d, len_bc, c, cb, gh)
    return du, db[0]


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_sru_padded(u, b2d, len_bc, rev, use_relu):
    h, _, _ = _fused_fwd_call(u, b2d, len_bc, rev, use_relu)
    return h


def _fused_sru_fwd(u, b2d, len_bc, rev, use_relu):
    h, c, cb = _fused_fwd_call(u, b2d, len_bc, rev, use_relu)
    return h, (u, b2d, len_bc, c, cb)


def _fused_sru_bwd(rev, use_relu, res, gh):
    u, b2d, len_bc, c, cb = res
    du, db = _fused_bwd_call(u, b2d, len_bc, c, cb, gh, rev, use_relu)
    db2d = jnp.zeros_like(b2d).at[0].set(db.astype(b2d.dtype))
    return du, db2d, jnp.zeros_like(len_bc)


_fused_sru_padded.defvjp(_fused_sru_fwd, _fused_sru_bwd)


# ===========================================================================
# Projection-fused SRU layer FORWARD: the input projection u = x @ W moved
# INSIDE the kernel (round-4 headline optimization).
#
# The u-based kernel above pays a u round trip forward: XLA's matmul writes
# u = x @ W (bf16 (T, B, 4H) — 40 MB at the bench shape) to HBM and the
# kernel reads it back — plus every pad/convert/copy XLA schedules around
# that materialization (measured 2.6 ms/step of pure `copy` in the round-3
# trace).  Here W (D x 4H, compute dtype) stays RESIDENT in VMEM for the
# whole grid and each grid step projects its (chunk, B, D) x-block on the
# MXU directly into the u OUTPUT block (the projection has no sequential
# dependence), which the recurrence loop then consumes in place.  u leaves
# the kernel as a normal output — it is the residual the backward needs.
#
# The BACKWARD deliberately stays split (measured on the v5e, this round):
# a fully-fused backward (in-kernel u-recompute + dx/dW matmuls) ran the
# three per-chunk MXU matmuls serialized with the VPU scan inside the
# sequential grid and LOST 3.5 ms/step vs letting XLA run dx = du @ W^T and
# dW = x^T @ du as two big near-peak matmuls.  So the backward is the
# pinned u-based kernel (_fused_bwd_call: reads u/c/gh, writes du) followed
# by the two XLA matmuls on the already-padded arrays — the round-3 profile
# shows that combination at its matmul bound.
#
# VMEM: v5e has 128 MB of VMEM; Mosaic's default scoped-vmem cap (~16 MB)
# is far below the hardware (probed empirically this round: 120 MB scratch
# compiles and runs with vmem_limit_bytes raised).  The forward sizes its
# chunk to MATCH the backward kernel's (the cb chunk-boundary layout is
# shared) and raises the cap via CompilerParams for the resident W.
#
# Numerics are pinned to matmul_cast + fused_sru_layer (models/common.py,
# tests/test_kernels.py): bf16 compute casts x/W to bf16, accumulates in
# f32, stores u as bf16; the recurrence state stays f32; dW is f32.
# ===========================================================================

_PROJ_BUDGET = 64 * 1024 * 1024
_PROJ_VMEM_LIMIT = 100 * 1024 * 1024


def _proj_resident(B, D, H, s):
    # W (io dtype) resident + recurrence carry
    return D * 4 * H * s + B * H * 4


def _proj_per_t(B, D, H, s):
    # double-buffered pipeline blocks per timestep: x in, u/h out, c (f32)
    return B * 2 * (D * s + 4 * H * s + H * s + 4 * H)


def _proj_chunk(B, D, H, io_dtype):
    # must EQUAL the u-based backward kernel's chunk (shared cb layout);
    # callers gate on sru_proj_feasible, which checks that THIS chunk's
    # working set fits the proj budget (a smaller chunk is not an option —
    # it would desync the cb layout from _fused_bwd_call)
    return _fused_chunk(B, H, _fused_per_h(io_dtype))


def sru_proj_feasible(B, D, H, compute_dtype):
    """True if the projection-fused forward's working set (resident W +
    the backward-matched chunk's pipeline) fits the VMEM budget.  At
    infeasible shapes (enormous D x H) callers must use the external
    projection + u-based kernel instead of compiling into a Mosaic
    scoped-vmem OOM."""
    Bp = _round_up(max(B, 1), 8)
    Dp = _round_up(max(D, 1), 128)
    Hp = _round_up(max(H, 1), 128)
    io = jnp.bfloat16 if jnp.dtype(compute_dtype) == jnp.bfloat16 \
        else jnp.float32
    s = jnp.dtype(io).itemsize
    chunk = _proj_chunk(Bp, Dp, Hp, io)
    # fm/bm: two (chunk, B, H) f32 scratch blocks of the vectorized-scan
    # form — grid-resident (not pipelined/double-buffered), counted once
    fm_bm = chunk * Bp * Hp * 8
    return (chunk * _proj_per_t(Bp, Dp, Hp, s) + fm_bm
            + _proj_resident(Bp, Dp, Hp, s) <= _PROJ_BUDGET)


def _proj_u(x_ref, w_ref, out_dtype):
    """(chunk, B, D) x-block @ (D, 4H) resident W on the MXU, f32 accum."""
    chunk, B, D = x_ref.shape
    x2 = x_ref[...].reshape(chunk * B, D)
    u2 = jax.lax.dot_general(x2, w_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return u2.reshape(chunk, B, -1).astype(out_dtype)


def _psru_fwd_kernel(rev, use_relu, chunk, n_chunks,
                     x_ref, w_ref, b_ref, len_ref,
                     h_ref, u_ref, c_ref, cb_ref,
                     carry_ref, fm_ref, bm_ref):
    # Same cell math as _fused_fwd_kernel (pinned in tests/test_kernels.py)
    # with u coming from the in-kernel projection, written straight into
    # the u OUTPUT block (it doubles as the backward's residual).  Same
    # vectorized-pre/serial-core/vectorized-post structure too: the MXU
    # projection and the chunk-wide VPU gate math both sit OUTSIDE the
    # serial fori_loop, which carries only c = fm*c + bm.
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    u_ref[...] = _proj_u(x_ref, w_ref, u_ref.dtype)
    cb_ref[0] = carry_ref[...]
    lv = len_ref[...]
    H = carry_ref.shape[-1]
    block = (n_chunks - 1 - t) if rev else t
    f32 = jnp.float32
    bf = b_ref[0, H:2 * H].astype(f32)
    br = b_ref[0, 2 * H:3 * H].astype(f32)

    m = _chunk_mask(chunk, block, lv)
    f = jax.nn.sigmoid(u_ref[:, :, H:2 * H].astype(f32) + bf)
    fm_ref[...] = f * m + (1.0 - m)
    bm_ref[...] = (1.0 - f) * u_ref[:, :, 0:H].astype(f32) * m

    def body(i, c):
        j = (chunk - 1 - i) if rev else i
        c = fm_ref[j] * c + bm_ref[j]
        c_ref[j] = c
        return c

    carry_ref[...] = jax.lax.fori_loop(0, chunk, body, carry_ref[...])

    r = jax.nn.sigmoid(u_ref[:, :, 2 * H:3 * H].astype(f32) + br)
    c_all = c_ref[...]
    g = jnp.maximum(c_all, 0.0) if use_relu else jnp.tanh(c_all)
    x_p = u_ref[:, :, 3 * H:4 * H].astype(f32)
    h_ref[...] = ((r * g + (1.0 - r) * x_p) * m).astype(h_ref.dtype)


def _psru_specs(T, B, D, H, chunk, rev):
    n_chunks = T // chunk

    def idx(t):
        return ((n_chunks - 1 - t) if rev else t, 0, 0)

    x_spec = pl.BlockSpec((chunk, B, D), idx, memory_space=pltpu.VMEM)
    u_spec = pl.BlockSpec((chunk, B, 4 * H), idx, memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((chunk, B, H), idx, memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((D, 4 * H), lambda t: (0, 0),
                          memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((B, H), lambda t: (0, 0),
                            memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((8, 4 * H), lambda t: (0, 0),
                          memory_space=pltpu.VMEM)
    cb_spec = pl.BlockSpec(
        (1, B, H), (lambda t: ((n_chunks - 1 - t) if rev else t, 0, 0)),
        memory_space=pltpu.VMEM)
    return x_spec, u_spec, h_spec, w_spec, len_spec, b_spec, cb_spec, \
        n_chunks


def _psru_fwd_call(x, w, b2d, len_bc, rev, use_relu):
    T, B, D = x.shape
    H = w.shape[-1] // 4
    w_c = w.astype(x.dtype) if w.dtype != x.dtype else w
    chunk = _proj_chunk(B, D, H, x.dtype)
    if T % chunk:
        raise ValueError(f"T={T} not divisible by chunk={chunk}")
    x_spec, u_spec, h_spec, w_spec, len_spec, b_spec, cb_spec, n_chunks = \
        _psru_specs(T, B, D, H, chunk, rev)
    from functools import partial

    kern = partial(_psru_fwd_kernel, rev, use_relu, chunk, n_chunks)
    out_shape = [jax.ShapeDtypeStruct((T, B, H), x.dtype),
                 jax.ShapeDtypeStruct((T, B, 4 * H), x.dtype),
                 jax.ShapeDtypeStruct((T, B, H), jnp.float32),
                 jax.ShapeDtypeStruct((n_chunks, B, H), jnp.float32)]
    return pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[x_spec, w_spec, b_spec, len_spec],
        out_specs=[h_spec, u_spec, h_spec, cb_spec],
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((chunk, B, H), jnp.float32),
                        pltpu.VMEM((chunk, B, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_PROJ_VMEM_LIMIT),
        interpret=not _on_tpu(),
    )(x, w_c, b2d, len_bc)


@_partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _psru_padded(x, w, b2d, len_bc, rev, use_relu):
    h, _, _, _ = _psru_fwd_call(x, w, b2d, len_bc, rev, use_relu)
    return h


def _psru_fwd(x, w, b2d, len_bc, rev, use_relu):
    h, u, c, cb = _psru_fwd_call(x, w, b2d, len_bc, rev, use_relu)
    return h, (x, w, b2d, len_bc, u, c, cb)


def _psru_bwd(rev, use_relu, res, gh):
    # du via the pinned u-based backward kernel; dx/dW as two big XLA
    # matmuls on the already-padded arrays (measured faster than fusing
    # them into the sequential grid — see the section comment).
    x, w, b2d, len_bc, u, c, cb = res
    du, db = _fused_bwd_call(u, b2d, len_bc, c, cb, gh, rev, use_relu)
    w_c = w.astype(x.dtype) if w.dtype != x.dtype else w
    T, B, D = x.shape
    du2 = du.reshape(T * B, -1)
    dx = jnp.matmul(du2, w_c.T, preferred_element_type=jnp.float32)
    dx = dx.reshape(T, B, D).astype(x.dtype)
    x2 = x.reshape(T * B, D)
    dw = jnp.matmul(x2.T, du2, preferred_element_type=jnp.float32)
    db2d = jnp.zeros_like(b2d).at[0].set(db.astype(b2d.dtype))
    return dx, dw.astype(w.dtype), db2d, jnp.zeros_like(len_bc)


_psru_padded.defvjp(_psru_fwd, _psru_bwd)


def fused_sru_proj_layer(x, w, lengths, bias4=None, reverse=False,
                         use_relu=0, compute_dtype="float32"):
    """One full SRU layer direction from the RAW INPUT ``x`` — the input
    projection runs inside the kernel (W resident in VMEM, per-chunk MXU
    matmul; dW/dx in-kernel too).  Numerically pinned to
    ``matmul_cast(x, w, compute_dtype)`` + :func:`fused_sru_layer`.

    x: (T, B, D) time-major; w: (D, 4H) in its PARAMETER dtype (f32 —
    the weight cotangent stays f32, the compute-dtype cast happens
    inside); bias4: (4H,) ``[0, bf, br, 0]`` (f/r gate blocks only, added
    in-kernel); lengths: (B,) int.  Returns h: (T, B, H) in the compute
    I/O dtype with padded frames zeroed.
    """
    T, B, D = x.shape
    H = w.shape[-1] // 4
    cd = jnp.dtype(compute_dtype)
    io = jnp.bfloat16 if cd == jnp.bfloat16 else jnp.float32
    if bias4 is None:
        bias4 = jnp.zeros((4 * H,), jnp.float32)
    x = x.astype(io)  # the astype's AD returns dx in the caller's dtype
    Bp = _round_up(max(B, 1), 8)
    Dp = _round_up(max(D, 1), 128)
    Hp = _round_up(max(H, 1), 128)
    Tp = _round_up(max(T, 1), _FUSED_MAX_CHUNK)
    if Hp != H:
        w = jnp.pad(w.reshape(D, 4, H), ((0, 0), (0, 0), (0, Hp - H))
                    ).reshape(D, 4 * Hp)
        bias4 = jnp.pad(bias4.reshape(4, H),
                        ((0, 0), (0, Hp - H))).reshape(4 * Hp)
    if Dp != D:
        w = jnp.pad(w, ((0, Dp - D), (0, 0)))
    if (Tp, Bp, Dp) != (T, B, D):
        x = jnp.pad(x, ((0, Tp - T), (0, Bp - B), (0, Dp - D)))
    len_bc = jnp.broadcast_to(
        jnp.asarray(lengths, jnp.float32)[:, None], (B, Hp))
    if Bp != B:
        len_bc = jnp.pad(len_bc, ((0, Bp - B), (0, 0)))
    b2d = jnp.broadcast_to(bias4.astype(jnp.float32)[None, :],
                           (8, 4 * Hp))
    h = _psru_padded(x, w, b2d, len_bc, bool(reverse), bool(use_relu))
    return h[:T, :B, :H]


def fused_sru_layer(u, lengths, bias4=None, reverse=False, use_relu=0):
    """One full SRU layer direction from raw pre-activations ``u = x @ W``.

    u: (T, B, 4H) time-major; bias4: (4H,) ``[0, bf, br, 0]`` — ONLY the
    f/r gate blocks are applied (the SRU cell has no x~/x' bias; those
    blocks of bias4 must be zero and receive zero gradient).  The bias add
    happens IN-KERNEL (no separate u+bias pass over HBM) and its gradient
    is accumulated in-kernel too (no full-du re-read).  lengths: (B,) int.
    Returns h: (T, B, H) with padded frames zeroed.
    """
    T, B, H4 = u.shape
    H = H4 // 4
    if bias4 is None:
        bias4 = jnp.zeros((H4,), jnp.float32)
    Bp = _round_up(max(B, 1), 8)
    Hp = _round_up(max(H, 1), 128)
    # T padded to the MAX chunk so every power-of-two chunk choice divides it
    Tp = _round_up(max(T, 1), _FUSED_MAX_CHUNK)
    if Hp != H:
        u = u.reshape(T, B, 4, H)
        u = jnp.pad(u, ((0, 0), (0, 0), (0, 0), (0, Hp - H)))
        u = u.reshape(T, B, 4 * Hp)
        bias4 = jnp.pad(bias4.reshape(4, H),
                        ((0, 0), (0, Hp - H))).reshape(4 * Hp)
    if (Tp, Bp) != (T, B):
        u = jnp.pad(u, ((0, Tp - T), (0, Bp - B), (0, 0)))
    len_bc = jnp.broadcast_to(
        jnp.asarray(lengths, jnp.float32)[:, None], (B, Hp))
    if Bp != B:
        len_bc = jnp.pad(len_bc, ((0, Bp - B), (0, 0)))
    b2d = jnp.broadcast_to(bias4.astype(jnp.float32)[None, :],
                           (8, 4 * Hp))
    h = _fused_sru_padded(u, b2d, len_bc, bool(reverse), bool(use_relu))
    return h[:T, :B, :H]
