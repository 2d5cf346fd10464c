"""Generate a tiny synthetic corpus with the reference's on-disk .npy contract
(per-utterance float32 arrays in X/ and Y/; SURVEY.md L6 output contract),
used by the end-to-end train tests and manual verification.

usage: python tests/make_synthetic_data.py <dst_dir> [--kind vc|acoustic|duration]
       [--num 16] [--order 19]
"""

from __future__ import annotations

import argparse
import os
import sys
from os.path import join

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gantts_tpu.core.windows import delta_features  # noqa: E402

WINDOWS3 = [
    (0, 0, np.array([1.0])),
    (1, 1, np.array([-0.5, 0.0, 0.5])),
    (1, 1, np.array([1.0, -2.0, 1.0])),
]


def smooth_trajectory(rs, T, D):
    """Random smooth static trajectory (lowpassed noise)."""
    x = rs.randn(T + 40, D)
    kernel = np.hanning(21)
    kernel /= kernel.sum()
    for d in range(D):
        x[:, d] = np.convolve(x[:, d], kernel, mode="same")
    return x[20:20 + T] * 3.0


def make_vc(dst, num, order, seed=0):
    rs = np.random.RandomState(seed)
    for name in ("X", "Y"):
        os.makedirs(join(dst, name), exist_ok=True)
    for i in range(num):
        T = int(rs.randint(80, 220)) // 2 * 2
        src = smooth_trajectory(rs, T, order)
        # target = warped source (a deterministic "speaker conversion")
        tgt = 0.8 * src + 0.4 * np.roll(src, 1, axis=1) + 0.1
        x = delta_features(src, WINDOWS3).astype(np.float32)
        y = delta_features(tgt, WINDOWS3).astype(np.float32)
        np.save(join(dst, "X", f"utt_{i:04d}.npy"), x)
        np.save(join(dst, "Y", f"utt_{i:04d}.npy"), y)
    print(f"VC corpus: {num} utts, dim {order * 3} -> {dst}/X,Y")


def make_acoustic(dst, num, seed=0, lin_dim=30, mgc_order=20):
    rs = np.random.RandomState(seed)
    os.makedirs(join(dst, "X_acoustic"), exist_ok=True)
    os.makedirs(join(dst, "Y_acoustic"), exist_ok=True)
    for i in range(num):
        T = int(rs.randint(80, 220))
        lin = np.clip(smooth_trajectory(rs, T, lin_dim), -4, 4)
        mgc_s = smooth_trajectory(rs, T, mgc_order)
        lf0_s = 5.0 + 0.2 * smooth_trajectory(rs, T, 1)
        vuv = (smooth_trajectory(rs, T, 1) > 0).astype(np.float64)
        bap_s = smooth_trajectory(rs, T, 1) * 0.1
        y = np.hstack([
            delta_features(mgc_s, WINDOWS3),
            delta_features(lf0_s, WINDOWS3),
            vuv,
            delta_features(bap_s, WINDOWS3),
        ]).astype(np.float32)
        np.save(join(dst, "X_acoustic", f"utt_{i:04d}.npy"),
                lin.astype(np.float32))
        np.save(join(dst, "Y_acoustic", f"utt_{i:04d}.npy"), y)
    print(f"acoustic corpus: {num} utts, stream_sizes=[{mgc_order*3},3,1,3] -> {dst}")


def make_duration(dst, num, seed=0, lin_dim=30):
    rs = np.random.RandomState(seed)
    os.makedirs(join(dst, "X_duration"), exist_ok=True)
    os.makedirs(join(dst, "Y_duration"), exist_ok=True)
    for i in range(num):
        T = int(rs.randint(20, 60))
        lin = np.clip(smooth_trajectory(rs, T, lin_dim), -4, 4)
        dur = np.abs(smooth_trajectory(rs, T, 5)) * 4 + 1
        np.save(join(dst, "X_duration", f"utt_{i:04d}.npy"),
                lin.astype(np.float32))
        np.save(join(dst, "Y_duration", f"utt_{i:04d}.npy"),
                dur.astype(np.float32))
    print(f"duration corpus: {num} utts -> {dst}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("dst_dir")
    p.add_argument("--kind", default="vc",
                   choices=["vc", "acoustic", "duration", "all"])
    p.add_argument("--num", type=int, default=16)
    p.add_argument("--order", type=int, default=19)
    a = p.parse_args()
    if a.kind in ("vc", "all"):
        make_vc(a.dst_dir, a.num, a.order)
    if a.kind in ("acoustic", "all"):
        make_acoustic(a.dst_dir, a.num)
    if a.kind in ("duration", "all"):
        make_duration(a.dst_dir, a.num)
