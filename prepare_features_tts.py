#!/usr/bin/env python
"""Prepare acoustic/duration features for TTS DNN training (TPU-native).

Flag surface of reference prepare_features_tts.py:1-11:

usage:
    prepare_features_tts.py [options] <DATA_ROOT>

options:
    --max_files=<N>      Max num files to be collected. [default: -1]
    --dst_dir=<d>        Destination directory [default: data/cmu_arctic_tts].
    --overwrite          Overwrite files.
    --workers=<N>        Host processes for per-utterance analysis.

Expects the Merlin slt_arctic layout: <DATA_ROOT>/wav/*.wav plus
<DATA_ROOT>/label_state_align/*.lab (or label_phone_align with
use_phone_alignment=True).  Outputs the per-utterance .npy contract of the
reference (X_duration/ Y_duration/ X_acoustic/ Y_acoustic/).
"""

from __future__ import annotations

import argparse
import os
import sys
from glob import glob
from os.path import basename, exists, join, splitext

import numpy as np
from scipy.io import wavfile


def _label_files(data_root, use_phone_alignment, max_files):
    d = "label_phone_align" if use_phone_alignment else "label_state_align"
    files = sorted(glob(join(data_root, d, "*.lab")))
    if max_files is not None and max_files > 0:
        files = files[:max_files]
    return files


def extract_linguistic(task):
    """Phone- or frame-level linguistic features for one label file
    (reference LinguisticSource, prepare_features_tts.py:36-67)."""
    path, question_path, add_frame_features, subphone_features = task
    from gantts_tpu.io import hts, merlin

    binary_dict, continuous_dict = hts.load_question_set(question_path)
    labels = hts.load(path)
    feats = merlin.linguistic_features(
        labels, binary_dict, continuous_dict,
        add_frame_features=add_frame_features,
        subphone_features=subphone_features)
    if add_frame_features:
        indices = labels.silence_frame_indices()
    else:
        indices = labels.silence_phone_indices()
    feats = np.delete(feats, indices[indices < len(feats)], axis=0)
    return feats.astype(np.float32)


def extract_duration(path):
    """Per-phone state durations (reference DurationSource,
    prepare_features_tts.py:70-89)."""
    from gantts_tpu.io import hts, merlin

    labels = hts.load(path)
    feats = merlin.duration_features(labels)
    indices = labels.silence_phone_indices()
    feats = np.delete(feats, indices[indices < len(feats)], axis=0)
    return feats.astype(np.float32)


def extract_acoustic(task):
    """Full WORLD chain for one utterance (reference AcousticSource,
    prepare_features_tts.py:92-157)."""
    wav_path, label_path = task
    from gantts_tpu import preprocessing as P
    from gantts_tpu.frontend import sptk, world
    from gantts_tpu.hparams import tts_acoustic as hp
    from gantts_tpu.io import hts

    fs, x = wavfile.read(wav_path)
    x = x.astype(np.float64)
    if hp.use_harvest:
        f0, timeaxis = world.harvest(
            x, fs, frame_period=hp.frame_period,
            f0_floor=hp.f0_floor, f0_ceil=hp.f0_ceil)
    else:
        f0, timeaxis = world.dio(
            x, fs, frame_period=hp.frame_period,
            f0_floor=hp.f0_floor, f0_ceil=hp.f0_ceil)
        f0 = world.stonemask(x, f0, timeaxis, fs)
    spectrogram = world.cheaptrick(x, f0, timeaxis, fs)
    aperiodicity = world.d4c(x, f0, timeaxis, fs)

    bap = world.code_aperiodicity(aperiodicity, fs)
    alpha = sptk.mcepalpha(fs)
    mgc = sptk.sp2mc(spectrogram, order=hp.order, alpha=alpha)
    f0 = f0[:, None]
    lf0 = f0.copy()
    nonzero = np.nonzero(f0)
    lf0[nonzero] = np.log(f0[nonzero])
    if hp.use_harvest:
        # Harvest's contour can carry F0 through frames WORLD considers
        # aperiodic; the reference derives V/UV from the 0-Hz aperiodicity
        # band instead (prepare_features_tts.py:131-135, citing
        # mmorise/World#35).  Same decision here for parity on the default
        # config path.
        vuv = (aperiodicity[:, 0] < 0.5).astype(np.float32)[:, None]
    else:
        vuv = (lf0 != 0).astype(np.float32)
    lf0 = P.interp1d(lf0, kind=hp.f0_interpolation_kind)

    if hp.mod_spec_smoothing:
        hop_length = int(fs * (hp.frame_period * 0.001))
        mgc = P.modspec_smoothing(
            mgc, fs / hop_length, cutoff=hp.mod_spec_smoothing_cutoff)

    mgc = P.delta_features(mgc, hp.windows)
    lf0 = P.delta_features(lf0, hp.windows)
    bap = P.delta_features(bap, hp.windows)

    features = np.hstack((mgc, lf0, vuv, bap))

    labels = hts.load(label_path)
    features = features[: labels.num_frames()]
    indices = labels.silence_frame_indices()
    features = np.delete(features, indices[indices < len(features)], axis=0)
    return features.astype(np.float32)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("DATA_ROOT")
    p.add_argument("--max_files", type=int, default=-1)
    p.add_argument("--dst_dir", default="data/cmu_arctic_tts")
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--workers", type=int, default=0)
    p.add_argument("--question_path", default=None,
                   help="Merlin .hed question set (overrides hparams)")
    p.add_argument("--hparams_acoustic", default="")
    p.add_argument("--hparams_duration", default="")
    args = p.parse_args(argv)

    from gantts_tpu.hparams import tts_acoustic as hp_acoustic
    from gantts_tpu.hparams import tts_duration as hp_duration

    hp_acoustic.parse(args.hparams_acoustic)
    hp_duration.parse(args.hparams_duration)
    if args.question_path:
        hp_acoustic.question_path = args.question_path
        hp_duration.question_path = args.question_path

    assert hp_acoustic.question_path == hp_duration.question_path
    assert hp_acoustic.use_phone_alignment == hp_duration.use_phone_alignment

    max_files = args.max_files
    label_files = _label_files(args.DATA_ROOT,
                               hp_acoustic.use_phone_alignment, max_files)
    wav_files = sorted(glob(join(args.DATA_ROOT, "wav", "*.wav")))
    if max_files is not None and max_files > 0:
        wav_files = wav_files[:max_files]

    roots = {k: join(args.dst_dir, k) for k in
             ("X_duration", "Y_duration", "X_acoustic", "Y_acoustic")}
    skip_dur = exists(roots["X_duration"]) and exists(roots["Y_duration"])
    skip_ac = exists(roots["X_acoustic"]) and exists(roots["Y_acoustic"])
    if args.overwrite:
        skip_dur = skip_ac = False
    for d in roots.values():
        os.makedirs(d, exist_ok=True)

    workers = args.workers or os.cpu_count() or 1
    import multiprocessing as mp

    if not skip_dur:
        tasks = [(f, hp_duration.question_path,
                  hp_duration.add_frame_features,
                  hp_duration.subphone_features) for f in label_files]
        with mp.Pool(workers) as pool:
            X = pool.map(extract_linguistic, tasks)
            Y = pool.map(extract_duration, label_files)
        print("Duration linguistic feature dim", X[0].shape[-1])
        print("Duration feature dim", Y[0].shape[-1])
        for f, x, y in zip(label_files, X, Y):
            name = splitext(basename(f))[0]
            np.save(join(roots["X_duration"], name), x)
            np.save(join(roots["Y_duration"], name), y)
    else:
        print("Features for duration model training found, skipping.")

    if not skip_ac:
        tasks = [(f, hp_acoustic.question_path,
                  hp_acoustic.add_frame_features,
                  hp_acoustic.subphone_features) for f in label_files]
        with mp.Pool(workers) as pool:
            X = pool.map(extract_linguistic, tasks)
            Y = pool.map(extract_acoustic, list(zip(wav_files, label_files)))
        print("Acoustic linguistic feature dim", X[0].shape[-1])
        print("Acoustic feature dim", Y[0].shape[-1])
        for f, x, y in zip(label_files, X, Y):
            name = splitext(basename(f))[0]
            # HTS label timings and WORLD frame counts can differ by a frame
            T = min(len(x), len(y))
            np.save(join(roots["X_acoustic"], name), x[:T])
            np.save(join(roots["Y_acoustic"], name), y[:T])
    else:
        print("Features for acoustic model training found, skipping.")

    print("Finished!")
    return 0


if __name__ == "__main__":
    sys.exit(main())
