#!/usr/bin/env python
"""Evaluation script for GAN-based VC models (TPU-native).

Flag surface of reference evaluation_vc.py:1-8:

usage: evaluation_vc.py [options] <checkpoint> <data_dir> <wav_dir> <outputs_dir>

options:
    --diffvc     Enable DIFF VC (spectral-differential MLSA filtering of the
                 source waveform, keeping the source excitation).
"""

from __future__ import annotations

import argparse
import os
import sys
from os.path import basename, join, splitext

import numpy as np
from scipy.io import wavfile


def get_wav_files(data_dir, wav_dir, test=False):
    """Same split re-derivation as the reference (evaluation_vc.py:121-129)."""
    from gantts_tpu.data import NPYDataSource

    if test:
        files = NPYDataSource(join(data_dir, "X"), test=True).collect_files()
    else:
        files = NPYDataSource(join(data_dir, "X"), train=False).collect_files()
    return [join(wav_dir, splitext(basename(f))[0] + ".wav") for f in files]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint")
    p.add_argument("data_dir")
    p.add_argument("wav_dir")
    p.add_argument("outputs_dir")
    p.add_argument("--diffvc", action="store_true")
    p.add_argument("--hparams", default="",
                   help="hparams overrides (vc bundle)")
    p.add_argument("--workers", type=int, default=1,
                   help="thread-pool fan-out over utterances (the host "
                        "WORLD/MLSA chain releases the GIL; device forwards "
                        "interleave) — the reference is strictly serial")
    args = p.parse_args(argv)

    from gantts_tpu import hparams
    from gantts_tpu.models import create_model
    from gantts_tpu.synthesis import vc_from_waveform
    from gantts_tpu.train.checkpoint import load_checkpoint

    hp = hparams.vc
    hp.parse(args.hparams)

    data_mean = np.load(join(args.data_dir, "data_mean.npy"))
    data_var = np.load(join(args.data_dir, "data_var.npy"))
    data_std = np.sqrt(data_var)

    if hp.generator_params["in_dim"] is None:
        hp.generator_params["in_dim"] = data_mean.shape[-1]
    if hp.generator_params["out_dim"] is None:
        hp.generator_params["out_dim"] = data_mean.shape[-1]

    model = create_model(hp.generator, **hp.generator_params)
    params, _, _ = load_checkpoint(args.checkpoint)

    eval_dir = join(args.outputs_dir, "eval")
    test_dir = join(args.outputs_dir, "test")
    os.makedirs(eval_dir, exist_ok=True)
    os.makedirs(test_dir, exist_ok=True)
    eval_files = get_wav_files(args.data_dir, args.wav_dir, test=False)
    test_files = get_wav_files(args.data_dir, args.wav_dir, test=True)

    def process(dst_dir, path):
        print(dst_dir, path)
        name = splitext(basename(path))[0]
        fs, x = wavfile.read(path)
        waveform, _, outputs = vc_from_waveform(
            model, params, x.astype(np.float64), fs, data_mean, data_std,
            hp, diffvc=args.diffvc)
        peak = np.max(np.abs(waveform))
        if peak > 32767:
            waveform = waveform / peak * 32767 * 0.99
        wavfile.write(join(dst_dir, name + ".wav"), fs,
                      waveform.astype(np.int16))
        return np.asarray(outputs)

    from gantts_tpu.utils.analysis import (
        run_utterance_jobs, write_analysis_report)

    jobs = [(dst_dir, path)
            for dst_dir, files in [(eval_dir, eval_files),
                                   (test_dir, test_files)]
            for path in files]
    generated_feats = run_utterance_jobs(process, jobs, args.workers)

    # GV / modulation-spectrum report (the reference publishes these as
    # notebook plots, notebooks/Test VC.ipynb; here they are first-class
    # eval output so quality evidence is machine-checkable).
    write_analysis_report(
        join(args.outputs_dir, "analysis.json"), generated_feats,
        natural_dir=join(args.data_dir, "Y"), static_dim=hp.order,
        modfs=1000.0 / hp.frame_period)
    return 0


if __name__ == "__main__":
    sys.exit(main())
