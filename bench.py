#!/usr/bin/env python
"""Benchmark: G+D adversarial training throughput (frames/sec/chip).

Headline workload = BASELINE.json config #4/#5 shape: tts_acoustic flagship
— 6x512 bidirectional SRU generator (22.9M params), linguistic-conditioned
MLP discriminator, mgc-stream adversarial loss with
mask_nth_mgc_for_adv_loss=2, full fused G+D step (G fwd/bwd, D update,
G update, device metrics), batch 20 x 512 frames (425-dim linguistic in,
187-dim WORLD features out).

Breadth (VERDICT round-2 item 6): with --full, the same fused step is also
measured for the flagship at batch 40/80, for the LSTM-family generator
(the reference's CPU-runnable alternative, hparams.py:111), and for the VC
In2OutHighwayNet config (BASELINE config #1/#2 shape) — reported under
"configs" in the same JSON line (measured table in README).

vs_baseline divides by a PyTorch-CPU implementation of the same training
step (the reference's own stack on this host: the reference publishes no
numbers — BASELINE.md — so the denominator is measured here, once, and
cached in bench_baseline_cache.json).  The torch baseline uses the
reference's LSTM fallback generator at the same size (the reference's SRU
is CUDA-only and cannot run on CPU at all; LSTMRNN/GRURNN are its
documented CPU-runnable alternatives for the same job, hparams.py:111).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from os.path import dirname, exists, join

import numpy as np

sys.path.insert(0, dirname(os.path.abspath(__file__)))

B, T = 20, 512
LIN_DIM, OUT_DIM = 425, 187
VC_DIM = 177  # 59 mel-cepstra x 3 windows
CACHE = join(dirname(os.path.abspath(__file__)), "bench_baseline_cache.json")


def _acoustic_hp(generator=None):
    from gantts_tpu import hparams

    hp = hparams.tts_acoustic.copy()
    # Production TPU config: RNN/MLP matmuls in bf16 with f32 accumulation
    # (MLPG stays f32 HIGHEST); ~4x MXU throughput + half the operand HBM
    # traffic on v5e.  Numerics validated in tests/test_models.py
    # (test_compute_dtype_bf16_close_to_f32).
    hp.compute_dtype = "bfloat16"
    hp.generator_params.update(in_dim=LIN_DIM, out_dim=OUT_DIM)
    # disc in_dim: 60 static mgc - 2 masked + 425 linguistic
    hp.discriminator_params.update(in_dim=60 - 2 + LIN_DIM)
    if generator == "LSTMRNN":
        # same trunk size as the flagship SRU (and as the torch baseline)
        hp.generator = "LSTMRNN"
        hp.generator_params = dict(
            in_dim=LIN_DIM, out_dim=OUT_DIM, num_hidden=6, hidden_dim=512,
            bidirectional=True, dropout=0.2)
    return hp


def _vc_hp():
    from gantts_tpu import hparams

    hp = hparams.vc.copy()
    hp.compute_dtype = "bfloat16"
    hp.generator_params.update(in_dim=VC_DIM, out_dim=VC_DIM)
    return hp


def bench_jax_tpu(hp, batch, in_dim, out_dim, steps=30, warmup=3,
                  windows_n=3):
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from gantts_tpu.core.windows import unit_variance_mlpg_matrix
    from gantts_tpu.train import GanTrainer, StepConfig
    from gantts_tpu.train.setup import init_models_and_states

    model_g, model_d, tx_g, tx_d, gstate, dstate = init_models_and_states(hp)
    cfg = StepConfig.from_hparams(hp, w_d=1.0, mse_w=0.0, mge_w=1.0,
                                  update_d=True, update_g=True)
    trainer = GanTrainer(model_g, model_d, tx_g, tx_d, cfg,
                         np.zeros(out_dim, np.float32),
                         np.ones(out_dim, np.float32))

    rs = np.random.RandomState(0)
    # K training steps per dispatch — train.py's single-device default
    # (trainer.multi_step_fn: straight-line K-step unroll so XLA aliases
    # the G/D/optimizer state in place; bit-identical to K sequential
    # steps).  Donation serializes each dispatch RPC (~2-6 ms on the axon
    # tunnel) against the device queue, so the unfused path measures
    # tunnel latency as much as the chip.
    K = 16
    xh = rs.rand(batch, T, in_dim).astype(np.float32)
    yh = rs.rand(batch, T, out_dim).astype(np.float32)
    lh = np.r_[rs.randint(T // 2, T, batch - 1), T].astype(np.int32)
    xs = jnp.asarray(np.stack([xh] * K))
    ys = jnp.asarray(np.stack([yh] * K))
    ls = jnp.asarray(np.stack([lh] * K))
    R = jnp.asarray(unit_variance_mlpg_matrix(hp.windows, T))
    rng = jr.key(0, impl="rbg")  # the train loop's dropout stream

    def _sync(out):
        # true sync on axon (block_until_ready is a no-op there for
        # pure-XLA programs): a device->host copy of an output buffer
        # cannot complete before the in-order device queue drains.
        np.asarray(jax.tree_util.tree_leaves(out)[0])

    step = trainer.multi_step_fn(train=True)
    adv_w = jnp.float32(1.0)  # uploaded once: every transfer is an RPC
    for i in range(warmup):
        gstate, dstate, out, rng = step(gstate, dstate, None, xs, ys, ls,
                                        R, None, adv_w, rng)
    _sync(out)
    # The axon tunnel's dispatch latency is wildly variable run-to-run;
    # take the best of several measurement windows so the recorded number
    # reflects device throughput, not a transient tunnel stall.
    best_dt = float("inf")
    for _ in range(windows_n):
        t0 = time.perf_counter()
        for i in range(steps):
            gstate, dstate, out, rng = step(gstate, dstate, None, xs, ys,
                                            ls, R, None, adv_w, rng)
        _sync(out)
        best_dt = min(best_dt, time.perf_counter() - t0)
    frames = float(lh.sum()) * steps * K
    return frames / best_dt


def bench_torch_cpu(steps=5, warmup=1, windows_n=3):
    """Reference-equivalent G+D step in PyTorch on this host's CPU.

    Best of ``windows_n`` windows of ``steps`` steps each (matching the
    TPU side's best-of-windows treatment): a CPU measurement this long
    (~1.5 min/window) still jitters with host load, and the denominator
    of the most-quoted number deserves the same variance discipline.  The
    per-window spread is recorded next to the cached value."""
    import torch
    import torch.nn as nn

    from gantts_tpu.core.windows import unit_variance_mlpg_matrix

    torch.set_num_threads(os.cpu_count() or 8)

    H, L = 512, 6  # same size as the flagship generator

    class Gen(nn.Module):
        def __init__(self):
            super().__init__()
            self.lstm = nn.LSTM(LIN_DIM, H, L, batch_first=True,
                                bidirectional=True, dropout=0.2)
            self.out = nn.Linear(2 * H, OUT_DIM)

        def forward(self, x):
            h, _ = self.lstm(x)
            return self.out(h)

    class Disc(nn.Module):
        def __init__(self):
            super().__init__()
            hd = 256
            self.net = nn.Sequential(
                nn.Linear(60 - 2 + LIN_DIM, hd), nn.LeakyReLU(0.01),
                nn.Dropout(0.5), nn.Linear(hd, hd), nn.LeakyReLU(0.01),
                nn.Dropout(0.5), nn.Linear(hd, hd), nn.LeakyReLU(0.01),
                nn.Dropout(0.5), nn.Linear(hd, 1), nn.Sigmoid())

        def forward(self, x):
            return self.net(x)

    g, d = Gen(), Disc()
    og = torch.optim.Adagrad(g.parameters(), lr=0.01, weight_decay=1e-7)
    od = torch.optim.Adagrad(d.parameters(), lr=0.01, weight_decay=1e-7)

    rs = np.random.RandomState(0)
    x = torch.from_numpy(rs.rand(B, T, LIN_DIM).astype(np.float32))
    y = torch.from_numpy(rs.rand(B, T, OUT_DIM).astype(np.float32))
    lengths = np.r_[rs.randint(T // 2, T, B - 1), T].astype(np.int64)
    mask = (torch.arange(T)[None, :]
            < torch.from_numpy(lengths)[:, None]).float()[..., None]
    windows = [(0, 0, np.array([1.0])), (1, 1, np.array([-0.5, 0.0, 0.5])),
               (1, 1, np.array([1.0, -2.0, 1.0]))]
    R = torch.from_numpy(unit_variance_mlpg_matrix(windows, T))

    def mlpg(u):  # (B, T, 3S) -> (B, T, S), window-major reorder
        S = u.shape[-1] // 3
        m = u.reshape(B, T, 3, S).transpose(1, 2).reshape(B, 3 * T, S)
        return torch.matmul(R, m)

    def step():
        og.zero_grad(), od.zero_grad()
        y_hat = g(x)
        mgc_static = mlpg(y_hat[..., :180])
        lf0_static = mlpg(y_hat[..., 180:183])
        bap_static = mlpg(y_hat[..., 184:187])
        y_hat_static = torch.cat(
            [mgc_static, lf0_static, y_hat[..., 183:184], bap_static], -1)
        y_static = torch.cat(
            [mlpg(y[..., :180]), mlpg(y[..., 180:183]), y[..., 183:184],
             mlpg(y[..., 184:187])], -1)
        Tm = mask.sum()
        adv_real = torch.cat([x, y_static[..., 2:60]], -1)
        adv_fake = torch.cat([x, y_hat_static.detach()[..., 2:60]], -1)
        loss_d = (-(torch.log(d(adv_real) + 1e-20) * mask).sum() / Tm
                  - (torch.log(1 - d(adv_fake) + 1e-20) * mask).sum() / Tm)
        loss_d.backward()
        torch.nn.utils.clip_grad_norm_(d.parameters(), 1.0)
        od.step()
        mge = ((y_hat_static - y_static) ** 2 * mask).sum() / Tm
        adv_g = torch.cat([x, y_hat_static[..., 2:60]], -1)
        loss_adv = -(torch.log(d(adv_g) + 1e-20) * mask).sum() / Tm
        (mge + loss_adv).backward()
        torch.nn.utils.clip_grad_norm_(g.parameters(), 1.0)
        og.step()

    for _ in range(warmup):
        step()
    rates = []
    for _ in range(windows_n):
        t0 = time.perf_counter()
        for _ in range(steps):
            step()
        dt = time.perf_counter() - t0
        rates.append(float(lengths.sum()) * steps / dt)
    return max(rates), rates


# Analytic matmul FLOPs of one fused G+D training step, per valid frame
# (SRU projections fwd 45.8M + bwd ~2x, MLP discriminator x3 + its backwards,
# MLPG; derivation in tools/profile_step.py / README perf section).
STEP_MFLOP_PER_FRAME = 141.0
V5E_BF16_PEAK_TFLOPS = 197.0


def main():
    # breadth rows are opt-in: the default run must stay fast enough for
    # unattended use (axon compile latency is variable; 4 extra configs
    # can add >10 min).  The measured breadth table lives in README.
    full = "--full" in sys.argv[1:]
    fps = bench_jax_tpu(_acoustic_hp(), B, LIN_DIM, OUT_DIM)
    configs = {}
    if full:
        # batch scaling of the flagship + the other model families; fewer
        # steps/windows (informational rows, not the headline metric)
        for bb in (40, 80):
            configs[f"tts_acoustic_sru_b{bb}"] = round(bench_jax_tpu(
                _acoustic_hp(), bb, LIN_DIM, OUT_DIM,
                steps=20, windows_n=2), 1)
        configs["tts_acoustic_lstm_b20"] = round(bench_jax_tpu(
            _acoustic_hp("LSTMRNN"), B, LIN_DIM, OUT_DIM,
            steps=20, windows_n=2), 1)
        configs["vc_in2out_b20"] = round(bench_jax_tpu(
            _vc_hp(), B, VC_DIM, VC_DIM, steps=20, windows_n=2), 1)
    if exists(CACHE):
        with open(CACHE) as f:
            baseline = json.load(f)["torch_cpu_frames_per_sec"]
    else:
        baseline, rates = bench_torch_cpu()
        with open(CACHE, "w") as f:
            json.dump({"torch_cpu_frames_per_sec": baseline,
                       "windows_frames_per_sec": [round(r, 2)
                                                  for r in rates],
                       "method": "best of 3 windows x 5 steps, warmup 1",
                       "workload": f"B={B} T={T} acoustic GAN step"}, f)
    mfu = fps * STEP_MFLOP_PER_FRAME * 1e6 / (V5E_BF16_PEAK_TFLOPS * 1e12)
    out = {
        "metric": "gan_train_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / baseline, 2),
        "mfu_vs_bf16_peak": round(mfu, 4),
    }
    if configs:
        out["configs"] = configs
    print(json.dumps(out))


if __name__ == "__main__":
    main()
