#!/usr/bin/env python
"""Ablation profile of the bench GAN step (real TPU).

Times each component of the fused step at the bench workload shape
(B=20, T=512, 425->187, 6x512 biSRU G, 3x256 MLP D) to localize the
bottleneck: full step, G forward, G fwd+bwd, SRU stack alone, Pallas scan
alone, MLPG matmul, D forward, optimizer updates.

Also measures a PURE-MATMUL lower bound for the SRU trunk: 12 independent
bf16 matmuls with the trunk's exact projection FLOPs (6 layers x 2
directions x (B*T,1024)@(1024,2048) = ~516 GFLOP fwd at B=20 T=512) and
3x that for fwd+bwd — the time the trunk could not possibly beat on the
MXU.  --batch sweeps the shape (README batch-scaling evidence).

usage: python tools/profile_step.py [--trace-dir DIR] [--batch N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from os.path import dirname

import numpy as np

sys.path.insert(0, dirname(dirname(os.path.abspath(__file__))))

T = 512
LIN_DIM, OUT_DIM = 425, 187


def _sync(out):
    """True synchronization on axon: `jax.block_until_ready` is a no-op
    there for pure-XLA programs (CLAUDE.md), but a device->host transfer of
    an output buffer cannot complete before the program that produces it —
    and the single TPU core runs dispatches in order, so materializing the
    LAST output's bytes proves every queued step finished."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)


def timed(fn, *args, steps=5, warmup=2):
    """Per-call DEVICE time from a jax.profiler trace.

    Host-side wall timing is untrustworthy on axon in BOTH directions:
    `jax.block_until_ready` is a no-op for pure-XLA programs (a loop can
    finish 'instantly'), and real synchronization (device->host transfer)
    exposes the tunnel's wildly variable per-call RPC latency, which
    dwarfs small components.  The profiler's device lane is the ground
    truth (CLAUDE.md measurement rule), so each component is traced for a
    few calls and the dominant top-level jit span is averaged."""
    import tempfile

    import jax

    from tools.trace_report import jit_device_ms

    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    d = tempfile.mkdtemp(prefix="gantts_prof_")
    jax.profiler.start_trace(d)
    for _ in range(steps):
        out = fn(*args)
    _sync(out)
    jax.profiler.stop_trace()
    return jit_device_ms(d, steps)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace-dir", default=None)
    p.add_argument("--compute-dtype", default="float32")
    p.add_argument("--mlpg", default="dense", choices=["dense", "stencil"])
    p.add_argument("--batch", type=int, default=20)
    p.add_argument("--layer-ablation", action="store_true",
                   help="decompose one biSRU layer: projection matmul vs "
                        "fused kernel vs concat (fwd and fwd+bwd)")
    args = p.parse_args()
    B = args.batch

    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from gantts_tpu import hparams
    from gantts_tpu.core.windows import unit_variance_mlpg_matrix
    from gantts_tpu.core.paramgen import multi_stream_mlpg
    from gantts_tpu.core.masking import masked_mse_loss, sequence_mask
    from gantts_tpu.train import GanTrainer, StepConfig
    from gantts_tpu.train.setup import init_models_and_states
    from gantts_tpu.models import create_model

    print("platform:", jax.devices()[0].platform, flush=True)

    hp = hparams.tts_acoustic.copy()
    hp.compute_dtype = args.compute_dtype
    hp.mlpg_impl = args.mlpg
    hp.generator_params.update(in_dim=LIN_DIM, out_dim=OUT_DIM)
    hp.discriminator_params.update(in_dim=60 - 2 + LIN_DIM)
    print("compute_dtype:", hp.compute_dtype, "mlpg:", hp.mlpg_impl,
          flush=True)

    model_g, model_d, tx_g, tx_d, gstate, dstate = init_models_and_states(hp)
    cfg = StepConfig.from_hparams(hp, w_d=1.0, mse_w=0.0, mge_w=1.0,
                                  update_d=True, update_g=True)
    trainer = GanTrainer(model_g, model_d, tx_g, tx_d, cfg,
                         np.zeros(OUT_DIM, np.float32),
                         np.ones(OUT_DIM, np.float32), windows=hp.windows)

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(B, T, LIN_DIM).astype(np.float32))
    y = jnp.asarray(rs.rand(B, T, OUT_DIM).astype(np.float32))
    lengths = jnp.asarray(
        np.r_[rs.randint(T // 2, T, B - 1), T].astype(np.int32))
    R = jnp.asarray(unit_variance_mlpg_matrix(hp.windows, T))
    rng = jr.key(0, impl="rbg")  # the train loop's dropout stream
    xd = jnp.asarray(rs.rand(B, T, 60 - 2 + LIN_DIM).astype(np.float32))

    rows = []

    # full fused step
    step = trainer.step_fn(train=True)

    def full(gs, ds, k):
        return step(gs, ds, None, x, y, lengths, R, None, jnp.float32(1.0), k)

    # run on copies (donation): re-init each loop is too slow; instead use
    # the returned states so buffers stay alive.  Wall time over the
    # chained-donated loop is the bench-equivalent number (includes the
    # tunnel); the device row comes from a trace like every component.
    gs, ds = gstate, dstate
    for _ in range(3):
        gs, ds, out, rng = full(gs, ds, rng)
    _sync(out)
    t0 = time.perf_counter()
    N = 20
    for _ in range(N):
        gs, ds, out, rng = full(gs, ds, rng)
    _sync(out)
    full_wall = (time.perf_counter() - t0) / N * 1e3
    rows.append(("full G+D step (wall)", full_wall))
    import tempfile

    from tools.trace_report import jit_device_ms

    d = tempfile.mkdtemp(prefix="gantts_prof_full_")
    jax.profiler.start_trace(d)
    for _ in range(5):
        gs, ds, out, rng = full(gs, ds, rng)
    _sync(out)
    jax.profiler.stop_trace()
    rows.append(("full G+D step (device)", jit_device_ms(d, 5)))

    # NOTE: every jit below takes the big arrays (x, y, R, xd) as ARGUMENTS
    # — axon's remote-compile endpoint rejects programs with large baked-in
    # closure constants (HTTP 413).

    # G forward only
    gfwd = jax.jit(
        lambda p, xx, ll: model_g.apply(p, xx, ll, deterministic=True))
    rows.append(("G forward", timed(gfwd, gs.params, x, lengths)))

    # G fwd+bwd (MGE loss through MLPG)
    y_static_ref = multi_stream_mlpg(y, R, tuple(hp.stream_sizes),
                                     tuple(hp.has_dynamic_features))
    mask = sequence_mask(lengths, T)[..., None]

    def g_loss(p, xx, ll, RR, ys, mm):
        yh = model_g.apply(p, xx, ll, deterministic=True)
        yhs = multi_stream_mlpg(yh, RR, tuple(hp.stream_sizes),
                                tuple(hp.has_dynamic_features))
        return masked_mse_loss(yhs, ys, mask=mm)

    gbwd = jax.jit(jax.grad(g_loss))
    rows.append(("G fwd+bwd (mge)",
                 timed(gbwd, gs.params, x, lengths, R, y_static_ref, mask)))

    # MLPG matmul alone (fwd)
    mlpg_fn = jax.jit(lambda u, RR: multi_stream_mlpg(
        u, RR, tuple(hp.stream_sizes), tuple(hp.has_dynamic_features)))
    rows.append(("MLPG fwd", timed(mlpg_fn, y, R)))

    # D forward
    dfwd = jax.jit(lambda p, xx, ll: model_d.apply(p, xx, ll,
                                                   deterministic=True))
    rows.append(("D forward", timed(dfwd, ds.params, xd, lengths)))

    # SRU stack alone (the 6x512 bidirectional trunk, no output head)
    from gantts_tpu.models.sru import SRU

    sru = SRU(hp.generator_params["hidden_dim"],
              hp.generator_params["num_hidden"],
              hp.generator_params["bidirectional"], 0.0, 0.0,
              hp.generator_params["use_relu"],
              compute_dtype=hp.compute_dtype)
    sru_vars = sru.init(jr.PRNGKey(0), x, lengths)
    sfwd = jax.jit(
        lambda v, xx, ll: sru.apply(v, xx, ll, deterministic=True))
    rows.append(("SRU trunk fwd", timed(sfwd, sru_vars, x, lengths)))

    def s_loss(v, xx, ll):
        return jnp.sum(sru.apply(v, xx, ll, deterministic=True) ** 2)

    sbwd = jax.jit(jax.grad(s_loss))
    rows.append(("SRU trunk fwd+bwd", timed(sbwd, sru_vars, x, lengths)))

    # pure-matmul lower bound for the trunk: 12 independent matmuls with
    # the trunk's exact projection FLOPs, in the trunk's compute dtype
    H = hp.generator_params["hidden_dim"]
    mm_dtype = jnp.bfloat16 if hp.compute_dtype == "bfloat16" \
        else jnp.float32
    xs_mm = jnp.asarray(rs.rand(B * T, 2 * H), mm_dtype)
    ws_mm = jnp.asarray(rs.rand(12, 2 * H, 4 * H) * 0.01, mm_dtype)

    def mm_bound(xx, ww):
        return sum(jnp.sum(xx @ ww[i]) for i in range(12))

    mmf = jax.jit(mm_bound)
    fwd_ms = timed(mmf, xs_mm, ws_mm)
    rows.append(("trunk matmul bound fwd", fwd_ms))
    rows.append(("trunk matmul bound f+b (3x)", 3.0 * fwd_ms))

    if args.layer_ablation:
        # one biSRU layer decomposed: projection matmul / fused kernel /
        # concat, fwd and fwd+bwd, in time-major layout.  The residual of
        # (layer total) - (parts) is XLA glue: transposes, bias concat,
        # dtype casts, and the concat's backward slices.
        from gantts_tpu import kernels
        from gantts_tpu.models.sru import SRULayer

        xe = jnp.swapaxes(x[..., :2 * H], 1, 0)  # (T, B, 2H) time-major
        if mm_dtype == jnp.bfloat16:
            xe = xe.astype(mm_dtype)
        layer = SRULayer(H, hp.generator_params["use_relu"],
                         hp.compute_dtype)
        lv = layer.init(jr.PRNGKey(1), xe.astype(jnp.float32), lengths)
        one_f = jax.jit(lambda v, xx, ll: layer.apply(
            v, xx.astype(jnp.float32), ll))
        rows.append(("1 SRULayer fwd", timed(one_f, lv, xe, lengths)))
        one_b = jax.jit(jax.grad(lambda v, xx, ll: jnp.sum(
            layer.apply(v, xx.astype(jnp.float32), ll)
            .astype(jnp.float32) ** 2)))
        rows.append(("1 SRULayer fwd+bwd", timed(one_b, lv, xe, lengths)))

        w1 = jnp.asarray(rs.rand(2 * H, 4 * H) * 0.01, mm_dtype)
        proj = jax.jit(lambda a, w: a.reshape(-1, 2 * H) @ w)
        rows.append(("1 layer proj matmul fwd", timed(proj, xe, w1)))

        u1 = jnp.asarray(rs.rand(T, B, 4 * H), mm_dtype)
        bias4 = jnp.zeros(4 * H, jnp.float32)
        kern_f = jax.jit(lambda uu, ll, bb: kernels.fused_sru_layer(
            uu, ll, bias4=bb, reverse=False,
            use_relu=hp.generator_params["use_relu"]))
        rows.append(("1 fused kernel fwd", timed(kern_f, u1, lengths,
                                                 bias4)))
        kern_b = jax.jit(jax.grad(
            lambda uu, ll, bb: jnp.sum(kernels.fused_sru_layer(
                uu, ll, bias4=bb, reverse=False,
                use_relu=hp.generator_params["use_relu"])
                .astype(jnp.float32) ** 2)))
        rows.append(("1 fused kernel fwd+bwd", timed(kern_b, u1, lengths,
                                                     bias4)))

        h2 = jnp.asarray(rs.rand(T, B, H), mm_dtype)
        cat = jax.jit(lambda a, b: jnp.concatenate([a, b], axis=-1) * 1.0)
        rows.append(("1 layer fwd/bwd concat", timed(cat, h2, h2)))

    # optimizer update alone (Adagrad over 22.9M G params)
    g_grads = jax.tree_util.tree_map(jnp.ones_like, gs.params)
    opt_fn = jax.jit(lambda grads, st, p: tx_g.update(grads, st, p))
    rows.append(("G optimizer update", timed(opt_fn, g_grads, gs.opt_state,
                                             gs.params)))

    # LSTM trunk (the cuDNN-slot family: LSTMRNN/GRURNN/In2OutRNNHighwayNet)
    from gantts_tpu.models.recurrent import StackedLSTM

    lstm = StackedLSTM(hp.generator_params["hidden_dim"], 3,
                       bidirectional=True, compute_dtype=hp.compute_dtype)
    lx = x[..., :512] if x.shape[-1] >= 512 else x
    lstm_vars = lstm.init(jr.PRNGKey(0), lx, lengths)
    lfwd = jax.jit(
        lambda v, xx, ll: lstm.apply(v, xx, ll, deterministic=True))
    rows.append(("LSTM trunk 3x fwd", timed(lfwd, lstm_vars, lx, lengths)))

    def l_loss(v, xx, ll):
        return jnp.sum(lstm.apply(v, xx, ll,
                                  deterministic=True).astype(jnp.float32)
                       ** 2)

    lbwd = jax.jit(jax.grad(l_loss))
    rows.append(("LSTM trunk 3x fwd+bwd", timed(lbwd, lstm_vars, lx,
                                                lengths)))

    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(gs.params))
    print(f"\nG params: {n_params/1e6:.1f}M   B={B} T={T}")
    for name, ms in rows:
        print(f"{name:24s} {ms:8.2f} ms")
    frames = float(np.asarray(lengths).sum())
    wall_ms, dev_ms = rows[0][1], rows[1][1]
    print(f"\nframes/sec/chip: {frames / (wall_ms / 1e3):,.0f} wall / "
          f"{frames / (dev_ms / 1e3):,.0f} device")

    if args.trace_dir:
        jax.profiler.start_trace(args.trace_dir)
        for _ in range(3):
            gs, ds, out, rng = full(gs, ds, rng)
        _sync(out)
        jax.profiler.stop_trace()
        print("trace ->", args.trace_dir)


if __name__ == "__main__":
    main()
