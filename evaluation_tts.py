#!/usr/bin/env python
"""Evaluation script for GAN-based text-to-speech synthesis (TPU-native).

Flag surface of reference evaluation_tts.py:1-12:

usage: evaluation_tts.py [options] <acoustic_checkpoint> <duration_checkpoint>
                         <data_dir> <labels_dir> <outputs_dir>

options:
    --fs=<fs>                 Sampling frequency [default: 16000].
    --disable-duraton-gen     Disable duration generation (use label timings).
    --post-filter             Apply Merlin's post filter to spectral features.
"""

from __future__ import annotations

import argparse
import os
import sys
from os.path import basename, join, splitext

import numpy as np
from scipy.io import wavfile


def get_lab_files(data_dir, label_dir, test=False):
    from gantts_tpu.data import NPYDataSource

    src = NPYDataSource(join(data_dir, "X_acoustic"),
                        train=False, test=test)
    files = src.collect_files()
    return [join(label_dir, splitext(basename(f))[0] + ".lab")
            for f in files]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("acoustic_checkpoint")
    p.add_argument("duration_checkpoint")
    p.add_argument("data_dir")
    p.add_argument("labels_dir")
    p.add_argument("outputs_dir")
    p.add_argument("--fs", type=int, default=16000)
    p.add_argument("--disable-duraton-gen", dest="disable_duration_gen",
                   action="store_true")
    p.add_argument("--post-filter", dest="post_filter", action="store_true")
    p.add_argument("--true-variance-mlpg", dest="true_variance_mlpg",
                   action="store_true",
                   help="MLPG with the training-set variances on the "
                        "denormalized features instead of the MGE-mode "
                        "unit-variance MLPG on normalized features "
                        "(capability addition: the reference implements "
                        "this path, evaluation_tts.py:84-98, but never "
                        "exposes a flag for it)")
    p.add_argument("--hparams_acoustic", default="")
    p.add_argument("--hparams_duration", default="")
    p.add_argument("--workers", type=int, default=1,
                   help="thread-pool fan-out over labels (the host vocoder "
                        "chain releases the GIL; device forwards "
                        "interleave) — the reference is strictly serial")
    args = p.parse_args(argv)

    from gantts_tpu import hparams
    from gantts_tpu.io import hts
    from gantts_tpu.models import create_model
    from gantts_tpu.synthesis import tts_from_label
    from gantts_tpu.train.checkpoint import load_checkpoint

    hp_acoustic = hparams.tts_acoustic
    hp_duration = hparams.tts_duration
    hp_acoustic.parse(args.hparams_acoustic)
    hp_duration.parse(args.hparams_duration)

    binary_dict, continuous_dict = hts.load_question_set(
        hp_acoustic.question_path)

    X_min, X_max, Y_mean, Y_std = {}, {}, {}, {}
    models, variables = {}, {}
    for typ in ["acoustic", "duration"]:
        X_min[typ] = np.load(join(args.data_dir, f"X_{typ}_data_min.npy"))
        X_max[typ] = np.load(join(args.data_dir, f"X_{typ}_data_max.npy"))
        Y_mean[typ] = np.load(join(args.data_dir, f"Y_{typ}_data_mean.npy"))
        Y_var = np.load(join(args.data_dir, f"Y_{typ}_data_var.npy"))
        Y_std[typ] = np.sqrt(Y_var)

        hp = hp_acoustic if typ == "acoustic" else hp_duration
        if hp.generator_params["in_dim"] is None:
            D = X_min[typ].shape[-1]
            if hp.generator_add_noise:
                D = D + hp.generator_noise_dim
            hp.generator_params["in_dim"] = D
        if hp.generator_params["out_dim"] is None:
            hp.generator_params["out_dim"] = Y_mean[typ].shape[-1]

        models[typ] = create_model(hp.generator, **hp.generator_params)
        ckpt = (args.acoustic_checkpoint if typ == "acoustic"
                else args.duration_checkpoint)
        variables[typ], _, _ = load_checkpoint(ckpt)

    eval_dir = join(args.outputs_dir, "eval")
    test_dir = join(args.outputs_dir, "test")
    os.makedirs(eval_dir, exist_ok=True)
    os.makedirs(test_dir, exist_ok=True)
    eval_files = get_lab_files(args.data_dir, args.labels_dir, test=False)
    test_files = get_lab_files(args.data_dir, args.labels_dir, test=True)

    def process(dst_dir, label_path):
        print(dst_dir, label_path)
        name = splitext(basename(label_path))[0]
        waveform, mgc, lf0, vuv, bap = tts_from_label(
            models, variables, label_path, X_min, X_max, Y_mean, Y_std,
            hp_duration, hp_acoustic, binary_dict, continuous_dict,
            apply_duration_model=not args.disable_duration_gen,
            post_filter=args.post_filter, fs=args.fs,
            mge_training=not args.true_variance_mlpg)
        wavfile.write(join(dst_dir, name + ".wav"), args.fs,
                      waveform.astype(np.int16))
        return np.asarray(mgc)

    from gantts_tpu.utils.analysis import (
        run_utterance_jobs, write_analysis_report)

    jobs = [(dst_dir, path)
            for dst_dir, files in [(eval_dir, eval_files),
                                   (test_dir, test_files)]
            for path in files]
    generated_mgc = run_utterance_jobs(process, jobs, args.workers)

    # GV / modulation-spectrum quality report (reference notebook analyses
    # as machine-checkable eval output).

    K = len(hp_acoustic.windows)
    write_analysis_report(
        join(args.outputs_dir, "analysis.json"), generated_mgc,
        natural_dir=join(args.data_dir, "Y_acoustic"),
        static_dim=hp_acoustic.stream_sizes[0] // K,
        modfs=1000.0 / hp_acoustic.frame_period)
    return 0


if __name__ == "__main__":
    sys.exit(main())
