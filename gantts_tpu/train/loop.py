"""The epoch/phase training loop — host orchestration around the fused step.

Faithful restructuring of the reference ``train_loop`` (train.py:435-648):
same two-phase (train/test) epoch structure, the same dynamic adversarial
weight ``adv_w = w_d * clip(E_mge/E_adv, 0, 1e3)`` carried as host-side
epoch state (train.py:575, 601-607), the same logged series names, the same
``checkpoint_epoch{N}_{Generator|Discriminator}.pth`` cadence.

TPU-specific changes (all deliberate):
  * MLPG matrices R are built once per bucketed length and cached
    (the reference rebuilt R on the host per batch, train.py:509-512);
  * per-batch scalars stay on device until the end of the epoch — the host
    never blocks inside the batch loop, so XLA keeps the pipeline full
    (the reference syncs per batch at train.py:588-595);
  * learning-rate decay rewrites the injected optimizer hyperparameter
    instead of mutating param groups (train.py:323-333 semantics).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from gantts_tpu.core.windows import unit_variance_mlpg_matrix
from gantts_tpu.train.checkpoint import save_checkpoint
from gantts_tpu.train.optim import exp_decayed_lr, set_learning_rate

CHECKPOINT_INTERVAL = 10  # reference train.py:66


def adv_weight(w_d, e_mge, e_adv):
    """Dynamic adversarial weight w_d * clip(E(mge)/E(adv), 0, 1e3)
    (reference train.py:575).  max() guard: a saturated D can make E(adv)
    EXACTLY zero (-log(1.0) == 0.0 in f32); Python float division raises
    where the reference's numpy division yields inf, clipped to 1e3 —
    reproduce the numpy endpoint."""
    return w_d * float(np.clip(e_mge / max(e_adv, 1e-30), 0, 1e3))


class RMatrixCache:
    """unit_variance_mlpg_matrix per bucketed length, device-resident.

    ``placer`` controls device placement (replicated over a mesh for the
    data-parallel trainer; plain upload otherwise)."""

    def __init__(self, windows, placer=jnp.asarray):
        self.windows = windows
        self.placer = placer
        self._cache = {}

    def get(self, T):
        if T not in self._cache:
            self._cache[T] = self.placer(
                np.asarray(unit_variance_mlpg_matrix(self.windows, T),
                           np.float32))
        return self._cache[T]


def train_loop(trainer, gstate, dstate, ref_params, dataset_loaders, hp,
               w_d=0.0, mse_w=0.0, mge_w=1.0, update_d=True, update_g=True,
               checkpoint_dir=None, writer=None, global_epoch=0,
               seed=1234, profile_dir=None, steps_per_dispatch=1):
    """Returns (gstate, dstate, final_epoch).

    Observability (SURVEY.md section 5): per-epoch wall time and
    frames/sec/chip are logged alongside the reference's scalar series; when
    ``profile_dir`` is set, a ``jax.profiler`` trace of the second training
    epoch is captured there (the first epoch is compile-dominated).
    """
    import time as _time

    cfg = trainer.cfg
    gstate, dstate = trainer.place_states(gstate, dstate)
    if ref_params is not None:
        (ref_params,) = trainer.place_states(ref_params)
    r_cache = (RMatrixCache(hp.windows, placer=trainer.put_replicated)
               if cfg.has_dynamic else None)
    noise_rs = np.random.RandomState(seed)
    # Dropout-mask stream.  XLA's rng-bit-generator is markedly cheaper
    # than threefry for the big (T, B, H) masks the SRU/LSTM stacks draw
    # (measured at the bench shape: G fwd+bwd 21.5 -> 19.6 ms) and is
    # natively GSPMD-partitionable (no cross-device gathers under DP).
    # Dropout needs statistical independence only, not a counter-based
    # reproducible-everywhere stream; GANTTS_TPU_PRNG=threefry restores
    # the old stream if bit-identical masks across jax versions matter.
    if os.environ.get("GANTTS_TPU_PRNG", "rbg") == "threefry":
        rng = jax.random.PRNGKey(seed)
    else:
        rng = jax.random.key(seed, impl="rbg")

    E_loss_mge = 1.0
    E_loss_adv = 1.0
    # Multi-step program form, remembered across phases/epochs once the
    # scan fallback is taken (run_fused below) so a failing unrolled
    # compile is not re-attempted every phase.  [None] = default
    # (unrolled).  Resolve the env override here too so run_fused's
    # "already on scan, nothing smaller to fall back to" check is exact.
    mstep_form = ["scan" if os.environ.get("GANTTS_TPU_MULTISTEP_SCAN")
                  else None]

    log = writer.log_value if writer is not None else (lambda *a: None)

    for epoch in range(global_epoch + 1, hp.nepoch + 1):
        # LR schedule (reference train.py:466-473)
        if hp.lr_decay_schedule and update_g:
            set_learning_rate(gstate.opt_state, exp_decayed_lr(
                hp.optimizer_g_params["lr"], epoch - 1, hp.lr_decay_epoch))
        if hp.lr_decay_schedule and update_d:
            set_learning_rate(dstate.opt_state, exp_decayed_lr(
                hp.optimizer_d_params["lr"], epoch - 1, hp.lr_decay_epoch))

        profiling = (profile_dir is not None
                     and epoch == global_epoch + 2)
        if profiling:
            jax.profiler.start_trace(profile_dir)

        for phase in ["train", "test"]:
            train = phase == "train"
            step = trainer.step_fn(train)
            N = len(dataset_loaders[phase])
            acc = []  # device-scalar dicts, reduced once per phase
            phase_t0 = _time.perf_counter()

            adv_w = adv_weight(w_d, E_loss_mge, E_loss_adv) \
                if update_g else 0.0
            # constant within the phase: upload ONCE (on axon every
            # host->device transfer is its own tunnel RPC)
            adv_w_dev = jnp.float32(adv_w)

            # Multi-step dispatch (single-device trainers only): groups of
            # K consecutive SAME-SHAPE batches run as one lax.scan program
            # (trainer.multi_step_fn) — bit-identical steps in the same
            # order with the same chained rng, at 1/K the dispatch count
            # (each dispatch is a serialized ~2 ms RPC on axon).  Shape
            # changes and epoch ends flush the pending group: full K-chunks
            # fused, the remainder one step at a time, order preserved.
            K = (max(1, int(steps_per_dispatch))
                 if getattr(trainer, "supports_multi_step", False) else 1)
            mstep = trainer.multi_step_fn(train, form=mstep_form[0]) \
                if K > 1 else None
            # shapes whose fused program has RUN at least once this phase
            # (jit recompiles per bucket shape, so compile rejection can
            # hit any NEW shape mid-phase, not just the first dispatch)
            mstep_ok = set()
            pend, pend_key = [], None

            def run_one(x, y, lengths, z):
                nonlocal gstate, dstate, rng
                R = r_cache.get(x.shape[1]) if r_cache is not None else None
                x, y, lengths, z = trainer.put_batch(x, y, lengths, z)
                # the step advances the dropout key in-program (no
                # per-batch split dispatch)
                gstate, dstate, out, rng = step(
                    gstate, dstate, ref_params, x, y, lengths,
                    R, z, adv_w_dev, rng)
                acc.append(out)

            def run_fused(chunk):
                nonlocal gstate, dstate, rng, mstep
                xs, ys, ls, zs = trainer.put_stacked_batch(
                    np.stack([c[0] for c in chunk]),
                    np.stack([c[1] for c in chunk]),
                    np.stack([c[2] for c in chunk]),
                    np.stack([c[3] for c in chunk])
                    if cfg.add_noise else None)
                R = (r_cache.get(chunk[0][0].shape[1])
                     if r_cache is not None else None)
                mkey = (xs.shape, ys.shape)
                try:
                    gstate, dstate, outs, rng = mstep(
                        gstate, dstate, ref_params, xs, ys, ls, R, zs,
                        adv_w_dev, rng)
                except Exception:
                    # A fused dispatch can fail at REMOTE-COMPILE time on
                    # axon (HTTP 413 for large programs; CLAUDE.md) — for
                    # ANY new bucket shape, since jit recompiles per
                    # shape.  Compile rejection happens before execution,
                    # so the donated state buffers are still live: retry
                    # once with the K-x-smaller lax.scan form (same math,
                    # bit-identical steps).  Do NOT retry if this shape's
                    # program has run before, if we are already on the
                    # scan form (no smaller program to fall back to), or
                    # if the failure happened MID-EXECUTION and consumed
                    # the donated states (retrying would mask the real
                    # error with 'Array has been deleted').
                    states_dead = any(
                        leaf.is_deleted()
                        for leaf in jax.tree_util.tree_leaves(
                            (gstate, dstate))
                        if hasattr(leaf, "is_deleted"))
                    if mkey in mstep_ok or mstep_form[0] == "scan" \
                            or states_dead:
                        raise
                    print("multi-step dispatch rejected; retrying with "
                          "the lax.scan program form")
                    mstep_form[0] = "scan"
                    mstep = trainer.multi_step_fn(train, form="scan")
                    gstate, dstate, outs, rng = mstep(
                        gstate, dstate, ref_params, xs, ys, ls, R, zs,
                        adv_w_dev, rng)
                mstep_ok.add(mkey)
                acc.append(outs)  # (K,)-stacked scalars

            def drain(rest_single):
                nonlocal pend
                while len(pend) >= K:
                    run_fused(pend[:K])
                    del pend[:K]
                if rest_single:
                    for b in pend:
                        run_one(*b)
                    pend = []

            for x, y, lengths in dataset_loaders[phase]:
                z = (noise_rs.rand(x.shape[0], x.shape[1],
                                   hp.generator_noise_dim)
                     .astype(np.float32) if cfg.add_noise else None)
                if K == 1:
                    run_one(x, y, lengths, z)
                    continue
                bkey = (x.shape, y.shape)
                if pend and bkey != pend_key:
                    drain(True)
                pend.append((x, y, lengths, z))
                pend_key = bkey
                drain(False)
            if K > 1:
                drain(True)

            # One host sync per phase
            acc = jax.device_get(acc)
            phase_dt = _time.perf_counter() - phase_t0
            sums = {}
            for out in acc:
                for k, v in out.items():
                    # fused dispatches contribute (K,)-stacked scalars
                    sums[k] = sums.get(k, 0.0) + float(np.sum(v))
            total_num_frames = sums.pop("num_frames", 1.0)

            # Throughput observability (north-star metric, SURVEY section 5)
            log(f"{phase} frames_per_sec", total_num_frames / phase_dt, epoch)
            log(f"{phase} epoch_seconds", phase_dt, epoch)

            # Update expectations (reference train.py:601-607).  NOTE: as in
            # the reference, E_loss_mge includes the MSE term when mse_w != 0.
            if update_d and update_g and phase == "train":
                E_loss_mge = (mse_w * sums.get("mse", 0.0)
                              + mge_w * sums.get("mge", 0.0)) / N
                E_loss_adv = sums.get("loss_adv", 0.0) / N
                log("E(mge)", E_loss_mge, epoch)
                log("E(adv)", E_loss_adv, epoch)
                log("MGE/ADV loss weight",
                    E_loss_mge / max(E_loss_adv, 1e-30), epoch)

            # Loss series (train.py:609-620)
            for ty, enabled in [("mse", update_g),
                                ("mge", update_g),
                                ("discriminator", cfg.update_d),
                                ("loss_real_d", cfg.update_d),
                                ("loss_fake_d", cfg.update_d),
                                ("loss_adv", update_g and cfg.update_d),
                                ("generator", update_g)]:
                if enabled and ty in sums:
                    log(f"{phase} {ty} loss", sums[ty] / N, epoch)

            # Distortion metrics (train.py:622-625)
            for k in ("mcd", "bap_mcd", "f0_rmse", "vuv_err", "dur_rmse"):
                if k in sums:
                    log(f"{phase} {k} metric", sums[k] / N, epoch)

            # D accuracy (train.py:627-632)
            if cfg.update_d:
                log(f"Real {phase} acc",
                    sums.get("real_correct_count", 0.0) / total_num_frames,
                    epoch)
                log(f"Fake {phase} acc",
                    sums.get("fake_correct_count", 0.0) / total_num_frames,
                    epoch)

            # Spoofing rate (train.py:634-637)
            if cfg.has_ref:
                log(f"{phase} spoofing rate",
                    sums.get("regard_fake_as_natural", 0.0) / total_num_frames,
                    epoch)

        if profiling:
            jax.profiler.stop_trace()

        if writer is not None:
            writer.flush()

        if checkpoint_dir is not None and epoch % CHECKPOINT_INTERVAL == 0:
            for state, enabled, name in [(gstate, update_g, "Generator"),
                                         (dstate, cfg.update_d, "Discriminator")]:
                if enabled:
                    save_checkpoint(state, epoch, checkpoint_dir, name)

    return gstate, dstate, hp.nepoch
