"""Vocoder fidelity regression gates (VERDICT round-1 item 4).

Runs the copy-synthesis benchmark (tools/copy_synthesis_bench.py) on a
reduced workload and asserts the checked-in vocoder_fidelity.json
quality levels hold (with margin).  Ground truth is synthetic speech with
known f0/vuv/formants, so this catches regressions in dio/harvest/
stonemask/cheaptrick/d4c/synthesize without needing a speech corpus.
"""

import os
import sys
from os.path import dirname

import numpy as np

REPO = dirname(dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from copy_synthesis_bench import (  # noqa: E402
    FS,
    f0_metrics,
    make_utterance,
    mcd,
)

from gantts_tpu.frontend import world  # noqa: E402


def test_harvest_f0_accuracy():
    # Post-coherence-gate levels (vocoder_fidelity.json: rmse 0.26 Hz,
    # core vuv 0.64%, zero gross over 6 utterances) with ~4x margin.
    x, f0_true, vuv = make_utterance(0)
    f0, t = world.harvest(x, FS)
    m = f0_metrics(f0, f0_true, vuv)
    assert m["f0_rmse_hz"] < 2.0, m
    assert m["gross_error_rate"] < 0.005, m
    assert m["vuv_error_core"] < 0.04, m


def test_dio_stonemask_f0_accuracy():
    # Post-consistency-fix levels (vocoder_fidelity.json: rmse 0.28 Hz,
    # zero gross over 6 utterances) with margin.
    x, f0_true, vuv = make_utterance(0)
    f0, t = world.dio(x, FS)
    f0 = world.stonemask(x, f0, t, FS)
    m = f0_metrics(f0, f0_true, vuv)
    assert m["f0_rmse_hz"] < 2.0, m
    assert m["gross_error_rate"] < 0.005, m
    assert m["vuv_error_core"] < 0.06, m


def test_copy_synthesis_mcd_and_aperiodicity():
    x, f0_true, vuv = make_utterance(1)
    f0, t = world.harvest(x, FS)
    sp = world.cheaptrick(x, f0, t, FS)
    ap = world.d4c(x, f0, t, FS)
    y = world.synthesize(f0, sp, ap, FS)
    # bench average 1.55 dB (vocoder_fidelity.json) after the event-based
    # synthesis rebuild + unvoiced spectral averaging; margin for the
    # single-utterance spread
    assert mcd(x, y) < 2.2

    n = min(len(f0), len(vuv))
    v = (f0[:n] > 0) & vuv[:n]
    uv = (f0[:n] == 0) & ~vuv[:n]
    nb = ap.shape[1]
    assert ap[:n][v][:, : nb // 4].mean() < 0.35
    # all-band voiced level post peak-tracked band NCC (bench: 0.32)
    assert ap[:n][v].mean() < 0.42
    assert ap[:n][uv].mean() > 0.95
