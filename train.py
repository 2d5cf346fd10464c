#!/usr/bin/env python
"""Training script for GAN-based TTS and VC models (TPU-native).

Flag-for-flag surface of the reference train.py:1-23 (argparse instead of
docopt — docopt is not in this environment):

usage: train.py [options] <inputs_dir> <outputs_dir>

options:
    --hparams_name=<name>       Name of hyper params [default: vc].
    --hparams=<params>          Hyper parameters to be overridden [default: ].
    --checkpoint-dir=<dir>      Where to save models [default: checkpoints].
    --checkpoint-g=<name>       Load generator from checkpoint if given.
    --checkpoint-d=<name>       Load discriminator from checkpoint if given.
    --checkpoint-r=<name>       Load reference model to compute spoofing rate.
    --max_files=<N>             Max num files to be collected. [default: -1]
    --discriminator-warmup      Warmup discriminator.
    --w_d=<f>                   Adversarial (ADV) loss weight [default: 1.0].
    --mse_w=<f>                 Mean squared error (MSE) loss weight [default: 0.0].
    --mge_w=<f>                 Minimum generation error (MGE) loss weight [default: 1.0].
    --restart_epoch=<N>         Restart epoch [default: -1].
    --reset_optimizers          Reset optimizers, otherwise restored from checkpoint.
    --log-event-path=<name>     Log event path.
    --disable-slack             Don't post the completion message to Slack
                                (posting requires SLACK_API_TOKEN, as in the
                                reference train.py:838-857).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from os.path import abspath, join
from warnings import warn

import numpy as np


def build_arg_parser():
    p = argparse.ArgumentParser(
        description="Training script for GAN-based TTS and VC models")
    p.add_argument("inputs_dir")
    p.add_argument("outputs_dir")
    p.add_argument("--hparams_name", default="vc")
    p.add_argument("--hparams", default="")
    p.add_argument("--checkpoint-dir", dest="checkpoint_dir",
                   default="checkpoints")
    p.add_argument("--checkpoint-g", dest="checkpoint_g", default=None)
    p.add_argument("--checkpoint-d", dest="checkpoint_d", default=None)
    p.add_argument("--checkpoint-r", dest="checkpoint_r", default=None)
    p.add_argument("--max_files", type=int, default=-1)
    p.add_argument("--discriminator-warmup", dest="discriminator_warmup",
                   action="store_true")
    p.add_argument("--w_d", type=float, default=1.0)
    p.add_argument("--mse_w", type=float, default=0.0)
    p.add_argument("--mge_w", type=float, default=1.0)
    p.add_argument("--restart_epoch", type=int, default=-1)
    p.add_argument("--reset_optimizers", action="store_true")
    p.add_argument("--log-event-path", dest="log_event_path", default=None)
    p.add_argument("--disable-slack", dest="disable_slack",
                   action="store_true")
    # --- TPU-build additions (SURVEY.md section 5 aux subsystems) ---
    p.add_argument("--steps-per-dispatch", dest="steps_per_dispatch",
                   type=int, default=0,
                   help="training steps fused into one device dispatch "
                        "(straight-line unroll over stacked same-shape "
                        "batches; bit-identical to unfused). 0 = auto: "
                        "16 on a single device, 1 under data parallelism")
    p.add_argument("--profile-dir", dest="profile_dir", default=None,
                   help="capture a jax.profiler trace of one epoch here")
    p.add_argument("--debug-nans", dest="debug_nans", action="store_true",
                   help="enable jax_debug_nans (fail fast on NaN/Inf)")
    # --- multi-chip / multi-host (SURVEY.md section 2.4) ---
    p.add_argument("--num-devices", dest="num_devices", type=int, default=0,
                   help="devices for the data mesh (0 = all visible; "
                        "1 forces the single-device trainer)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize first")
    p.add_argument("--coordinator-address", dest="coordinator_address",
                   default=None)
    p.add_argument("--num-processes", dest="num_processes", type=int,
                   default=None)
    p.add_argument("--process-id", dest="process_id", type=int, default=None)
    return p


def main(argv=None):
    since = time.time()
    args = build_arg_parser().parse_args(argv)
    print("Command line args:\n", vars(args))

    # (The GANTTS_TPU_PLATFORM pin happens in gantts_tpu/__init__, which
    # this module imports before any backend-initializing call.)

    # Optional persistent XLA compilation cache (off by default: on the
    # axon/TPU-tunnel backend, enabling it makes compiles ~20x SLOWER —
    # measured 116 s vs 6 s for the same program — so only opt in where the
    # backend serializes executables cheaply, e.g. CPU or direct TPU).
    if os.environ.get("GANTTS_TPU_COMPILE_CACHE"):
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.environ["GANTTS_TPU_COMPILE_CACHE"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)

    # Multi-host bring-up must precede any backend-initializing JAX call.
    if args.distributed:
        from gantts_tpu.parallel import initialize_distributed

        initialize_distributed(args.coordinator_address,
                               args.num_processes, args.process_id)

    from gantts_tpu import hparams
    from gantts_tpu.hparams import hparams_debug_string
    from gantts_tpu.train import (
        GanTrainer,
        StepConfig,
        TrainState,
        load_checkpoint,
        save_checkpoint,
        train_loop,
    )
    from gantts_tpu.train.logging import ScalarWriter
    from gantts_tpu.train.setup import (
        init_models_and_states,
        load_arrays,
        prepare_tts,
        prepare_vc,
    )

    hp = getattr(hparams, args.hparams_name)
    hp.parse(args.hparams)
    print(hparams_debug_string(hp))

    inputs_dir, outputs_dir = args.inputs_dir, args.outputs_dir
    # Assuming inputs and outputs are in same parent directory (train.py:674-677)
    data_dir = abspath(join(inputs_dir, os.pardir))
    assert data_dir == abspath(join(outputs_dir, os.pardir))

    max_files = args.max_files if args.max_files > 0 else None
    w_d, mse_w, mge_w = args.w_d, args.mse_w, args.mge_w
    update_d = w_d > 0
    update_g = not args.discriminator_warmup

    os.makedirs(args.checkpoint_dir, exist_ok=True)

    X, Y, utt_lengths = load_arrays(inputs_dir, outputs_dir, max_files)

    if hp.name == "vc":
        loaders, Y_mean, Y_std = prepare_vc(X, Y, utt_lengths, hp, data_dir)
    else:
        loaders, Y_mean, Y_std = prepare_tts(X, Y, utt_lengths, hp, data_dir)

    model_g, model_d, tx_g, tx_d, gstate, dstate = init_models_and_states(hp)
    print("Generator:", model_g)
    print("Discriminator:", model_d)

    # Reference discriminator for spoofing rate (train.py:779-788)
    ref_params = None
    if args.checkpoint_r is not None:
        try:
            ref_params, _, _ = load_checkpoint(args.checkpoint_r)
        except Exception:
            warn("Invalid checkpoint for reference discriminator")
            ref_params = None

    global_epoch = 0
    if args.checkpoint_d:
        params, opt, global_epoch = load_checkpoint(
            args.checkpoint_d, opt_template=dstate.opt_state)
        dstate = TrainState(params=params,
                            opt_state=dstate.opt_state
                            if args.reset_optimizers or opt is None else opt)
    if args.checkpoint_g:
        params, opt, global_epoch = load_checkpoint(
            args.checkpoint_g, opt_template=gstate.opt_state)
        gstate = TrainState(params=params,
                            opt_state=gstate.opt_state
                            if args.reset_optimizers or opt is None else opt)
    if args.restart_epoch >= 0:
        global_epoch = args.restart_epoch

    log_event_path = args.log_event_path
    if log_event_path is None:
        log_event_path = "log/run-test" + str(np.random.randint(100000))
    print(f"Log event path: {log_event_path}")
    writer = ScalarWriter(log_event_path)

    cfg = StepConfig.from_hparams(hp, w_d, mse_w, mge_w, update_d, update_g,
                                  has_ref=ref_params is not None)

    # Data parallelism over a device mesh: automatic whenever more than one
    # device is visible (SURVEY.md section 2.4 — the TPU build's headline
    # addition over the strictly single-device reference).  XLA's SPMD
    # partitioner inserts the gradient all-reduces; the step body is
    # identical to the single-device trainer's.
    import jax

    n_visible = len(jax.devices())
    if args.num_devices > 0 and jax.process_count() > 1 \
            and args.num_devices < n_visible:
        # A sub-mesh of the first N GLOBAL devices can exclude some hosts
        # entirely; their put_batch would own zero addressable shards and
        # the collectives would deadlock. Cap per-host instead of here.
        raise SystemExit(
            f"--num-devices={args.num_devices} < {n_visible} global devices "
            "is not supported with --distributed: every process must own "
            "part of the mesh. Limit devices per host via "
            "JAX_VISIBLE_DEVICES / platform flags instead.")
    n_mesh = min(args.num_devices, n_visible) if args.num_devices > 0 \
        else n_visible
    if n_mesh > 1:
        from gantts_tpu.parallel import DataParallelGanTrainer, make_mesh

        mesh = make_mesh(n_mesh)
        print(f"Data-parallel over {n_mesh} devices "
              f"({jax.process_count()} host(s)): {mesh}")
        trainer = DataParallelGanTrainer(
            model_g, model_d, tx_g, tx_d, cfg, Y_mean, Y_std,
            windows=hp.windows, mesh=mesh)
    else:
        trainer = GanTrainer(model_g, model_d, tx_g, tx_d, cfg, Y_mean,
                             Y_std, windows=hp.windows)

    # K=16 measured best on the axon tunnel (bench.py: 531.9k -> 543.9k
    # frames/s over K=8 — the per-dispatch RPC is ~4-5 ms, so halving the
    # dispatch count buys ~0.3 ms/step; K=32 is inside run-to-run noise
    # and doubles program size/compile time again)
    spd = args.steps_per_dispatch if args.steps_per_dispatch > 0 \
        else (16 if trainer.supports_multi_step else 1)

    print(f"Start training from epoch {global_epoch}")
    gstate, dstate, final_epoch = train_loop(
        trainer, gstate, dstate, ref_params, loaders, hp,
        w_d=w_d, mse_w=mse_w, mge_w=mge_w,
        update_d=update_d, update_g=update_g,
        checkpoint_dir=args.checkpoint_dir, writer=writer,
        global_epoch=global_epoch, profile_dir=args.profile_dir,
        steps_per_dispatch=spd)

    for state, enabled, name in [(gstate, update_g, "Generator"),
                                 (dstate, cfg.update_d, "Discriminator")]:
        if enabled:
            save_checkpoint(state, final_epoch, args.checkpoint_dir, name)

    writer.close()

    # Completion notification (reference train.py:838-857): posts only when
    # SLACK_API_TOKEN is set and --disable-slack is absent; failures are
    # swallowed exactly like the reference's try/except.
    if not args.disable_slack and "SLACK_API_TOKEN" in os.environ:
        try:
            import json as _json
            import urllib.request

            msg = (f"train.py finished! Elapsed: "
                   f"{(time.time() - since) // 60:.0f} mins.\n"
                   f"Args: {vars(args)}")
            req = urllib.request.Request(
                "https://slack.com/api/chat.postMessage",
                data=_json.dumps({"channel": "#research", "text": msg}
                                 ).encode(),
                headers={
                    "Authorization":
                        f"Bearer {os.environ['SLACK_API_TOKEN']}",
                    "Content-Type": "application/json"})
            urllib.request.urlopen(req, timeout=10)
        except Exception as e:
            print(str(e))

    print(f"Finished! Elapsed: {(time.time() - since) / 60:.1f} min")
    return 0


if __name__ == "__main__":
    sys.exit(main())
