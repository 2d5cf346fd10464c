#!/usr/bin/env python
"""Streamed-epoch throughput with the host pipeline in the loop.

bench.py measures the device step on ONE pre-staged batch; this tool
measures whole STREAMED epochs (normalize -> pad -> H2D -> step) so the
host pipeline's prefetching (data.BatchIterator num_workers) is visible.
Both loader settings run interleaved (A B A B ...) inside one process and
one compiled program set, so axon's compile latency and machine drift
cancel out of the comparison.

usage: python tools/host_pipeline_bench.py <X_dir> <Y_dir>
           [--hparams_name vc] [--hparams ...] [--epochs 6] [--workers 4]

Prints one JSON line: median epoch seconds + frames/sec for num_workers=0
and num_workers=<workers>.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from os.path import dirname

import numpy as np

sys.path.insert(0, dirname(dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("inputs_dir")
    p.add_argument("outputs_dir")
    p.add_argument("--hparams_name", default="vc")
    p.add_argument("--hparams", default="")
    p.add_argument("--epochs", type=int, default=6,
                   help="measured epochs PER loader setting")
    p.add_argument("--workers", type=int, default=4)
    args = p.parse_args()

    import gantts_tpu  # noqa: F401  (platform pin)
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from gantts_tpu import hparams
    from gantts_tpu.data import BatchIterator
    from gantts_tpu.train import GanTrainer, StepConfig
    from gantts_tpu.train.loop import RMatrixCache
    from gantts_tpu.train.setup import (
        init_models_and_states, load_arrays, prepare_tts, prepare_vc)

    hp = getattr(hparams, args.hparams_name).copy()
    hp.parse(args.hparams)
    X, Y, lens = load_arrays(args.inputs_dir, args.outputs_dir)
    prep = prepare_vc if hp.name == "vc" else prepare_tts
    loaders, Y_mean, Y_std = prep(X, Y, lens, hp, args.inputs_dir)
    base_ds = loaders["train"].dataset

    model_g, model_d, tx_g, tx_d, gstate, dstate = init_models_and_states(hp)
    cfg = StepConfig.from_hparams(hp, w_d=1.0, mse_w=0.0, mge_w=1.0,
                                  update_d=True, update_g=True)
    trainer = GanTrainer(model_g, model_d, tx_g, tx_d, cfg, Y_mean, Y_std)
    step = trainer.step_fn(train=True)
    r_cache = RMatrixCache(hp.windows) if cfg.has_dynamic else None
    rng = jr.PRNGKey(0)

    def run_epoch(loader):
        nonlocal gstate, dstate, rng
        t0 = time.perf_counter()
        frames = 0.0
        out = None
        for x, y, lengths in loader:
            R = r_cache.get(x.shape[1]) if r_cache is not None else None
            gstate, dstate, out, rng = step(
                gstate, dstate, None, jnp.asarray(x), jnp.asarray(y),
                jnp.asarray(lengths), R, None, jnp.float32(1.0), rng)
            frames += float(lengths.sum())
        jax.block_until_ready(out)
        return time.perf_counter() - t0, frames

    def make_loader(nw):
        # each setting gets its own iterator (its own epoch counter), same
        # dataset, same seed -> identical batch sequences
        return BatchIterator(base_ds, hp.batch_size, shuffle=True,
                             bucket_multiple=hp.batch_bucket_multiple,
                             num_workers=nw, cache_size=hp.cache_size)

    it0, itw = make_loader(0), make_loader(args.workers)
    # warmup: one full epoch each (compiles every bucket shape + fills the
    # normalized-item caches so both settings measure steady state)
    run_epoch(it0)
    run_epoch(itw)

    rows = {0: [], args.workers: []}
    for _ in range(args.epochs):
        for nw, it in ((0, it0), (args.workers, itw)):
            dt, frames = run_epoch(it)
            rows[nw].append((dt, frames))

    def summarize(rs):
        dts = sorted(dt for dt, _ in rs)
        med = dts[len(dts) // 2]
        fr = np.mean([f for _, f in rs])
        return {"median_epoch_s": round(med, 3),
                "frames_per_sec": round(float(fr) / med, 1)}

    out = {
        "metric": "streamed_epoch_throughput",
        "workload": f"{len(base_ds)} utts, batch {hp.batch_size}, "
                    f"{args.hparams_name}",
        "num_workers_0": summarize(rows[0]),
        f"num_workers_{args.workers}": summarize(rows[args.workers]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
