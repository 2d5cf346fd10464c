#!/usr/bin/env python
"""Prepare acoustic features for one-to-one voice conversion (TPU-native).

Flag surface of reference prepare_features_vc.py:1-11:

usage:
    prepare_features_vc.py [options] <DATA_ROOT> <source_speaker> <target_speaker>

options:
    --max_files=<N>      Max num files to be collected. [default: 100]
    --dst_dir=<d>        Destination directory [default: data/cmu_arctic_vc].
    --overwrite          Overwrite files.
    --workers=<N>        Host processes for per-utterance analysis [default: #cpus].

Per-utterance WORLD/SPTK analysis (the reference's host-side bottleneck,
SURVEY.md section 3.4) is fanned out over a process pool.
"""

from __future__ import annotations

import argparse
import os
import sys
from glob import glob
from os.path import basename, exists, join, splitext

import numpy as np
from scipy.io import wavfile


def collect_wav_files(data_root, speaker, max_files):
    """CMU ARCTIC layout: <root>/cmu_us_<spk>_arctic/wav/*.wav, with a plain
    <root>/<spk>/*.wav fallback."""
    cands = [join(data_root, f"cmu_us_{speaker}_arctic", "wav", "*.wav"),
             join(data_root, speaker, "*.wav"),
             join(data_root, speaker, "wav", "*.wav")]
    for pat in cands:
        files = sorted(glob(pat))
        if files:
            break
    if not files:
        raise FileNotFoundError(
            f"No wavs for speaker {speaker!r} under {data_root} "
            f"(tried {cands})")
    if max_files is not None and max_files > 0:
        files = files[:max_files]
    return files


def extract_mgc(wav_path):
    """WORLD mgc extraction (reference MGCSource.collect_features,
    prepare_features_vc.py:43-61): dio+stonemask -> cheaptrick -> sp2mc,
    drop c0, 50 Hz modspec smoothing, delta stacking."""
    from gantts_tpu import preprocessing as P
    from gantts_tpu.frontend import sptk, world
    from gantts_tpu.hparams import vc as hp

    fs, x = wavfile.read(wav_path)
    x = x.astype(np.float64)
    f0, timeaxis = world.dio(x, fs, frame_period=hp.frame_period)
    f0 = world.stonemask(x, f0, timeaxis, fs)
    spectrogram = world.cheaptrick(x, f0, timeaxis, fs)
    spectrogram = P.trim_zeros_frames(spectrogram)
    alpha = sptk.mcepalpha(fs)
    mgc = sptk.sp2mc(spectrogram, order=hp.order, alpha=alpha)
    mgc = mgc[:, 1:]  # drop 0-th coefficient
    hop_length = int(fs * (hp.frame_period * 0.001))
    mgc = P.modspec_smoothing(mgc, fs / hop_length, cutoff=50)
    mgc = P.delta_features(mgc, hp.windows)
    return mgc.astype(np.float32)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("DATA_ROOT")
    p.add_argument("source_speaker")
    p.add_argument("target_speaker")
    p.add_argument("--max_files", type=int, default=100)
    p.add_argument("--dst_dir", default="data/cmu_arctic_vc")
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--workers", type=int, default=0)
    args = p.parse_args(argv)

    from gantts_tpu import preprocessing as P
    from gantts_tpu.preprocessing.alignment import DTWAligner

    skip = exists(join(args.dst_dir, "X")) and exists(join(args.dst_dir, "Y"))
    if args.overwrite:
        skip = False
    if skip:
        print("Features seem to be prepared, skipping feature extraction.")
        return 0

    src_files = collect_wav_files(args.DATA_ROOT, args.source_speaker,
                                  args.max_files)
    tgt_files = collect_wav_files(args.DATA_ROOT, args.target_speaker,
                                  args.max_files)
    n = min(len(src_files), len(tgt_files))
    src_files, tgt_files = src_files[:n], tgt_files[:n]

    for d in ("X", "Y"):
        os.makedirs(join(args.dst_dir, d), exist_ok=True)

    workers = args.workers or os.cpu_count() or 1
    print(f"Extracting WORLD features for {n} pairs with {workers} workers")
    if workers > 1:
        import multiprocessing as mp

        with mp.Pool(workers) as pool:
            X = pool.map(extract_mgc, src_files)
            Y = pool.map(extract_mgc, tgt_files)
    else:
        X = [extract_mgc(f) for f in src_files]
        Y = [extract_mgc(f) for f in tgt_files]

    # Pad into (N, Tmax, D) for the aligner contract
    Tmax = max(max(len(a) for a in X), max(len(b) for b in Y))
    D = X[0].shape[1]
    Xp = np.zeros((n, Tmax, D), np.float32)
    Yp = np.zeros((n, Tmax, D), np.float32)
    for i in range(n):
        Xp[i, : len(X[i])] = X[i]
        Yp[i, : len(Y[i])] = Y[i]

    print("Perform alignment")
    Xa, Ya = DTWAligner().transform((Xp, Yp))

    print("Save features to disk")
    for idx in range(n):
        src_name = splitext(basename(src_files[idx]))[0]
        tgt_name = splitext(basename(tgt_files[idx]))[0]
        x = P.trim_zeros_frames(Xa[idx])
        y = P.trim_zeros_frames(Ya[idx])
        x, y = P.adjust_frame_lengths(x, y, pad=True, divisible_by=2)
        np.save(join(args.dst_dir, "X", src_name), x)
        np.save(join(args.dst_dir, "Y", tgt_name), y)
    print("Finished!")
    return 0


if __name__ == "__main__":
    sys.exit(main())
