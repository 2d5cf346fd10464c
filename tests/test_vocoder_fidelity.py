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
import pytest

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
    # Round-5 levels incl. the onset re-probe (vocoder_fidelity.json:
    # rmse 0.298 Hz, core vuv 0.88%, zero gross over 6 utterances) with
    # generous margin.
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
    # bench average 1.32 dB (vocoder_fidelity.json) after the event-based
    # synthesis rebuild, unvoiced spectral averaging, and the sub-window
    # complex-correlation d4c; margin for the single-utterance spread
    assert mcd(x, y) < 1.7

    n = min(len(f0), len(vuv))
    v = (f0[:n] > 0) & vuv[:n]
    uv = (f0[:n] == 0) & ~vuv[:n]
    nb = ap.shape[1]
    assert ap[:n][v][:, : nb // 4].mean() < 0.15  # bench: 0.077
    # all-band voiced level (bench: 0.138)
    assert ap[:n][v].mean() < 0.22
    assert ap[:n][uv].mean() > 0.95


def test_d4c_accuracy_vs_known_mixture():
    """d4c band estimates against GROUND-TRUTH aperiodicity (the harmonic
    and noise components are synthesized separately)."""
    from copy_synthesis_bench import true_band_aperiodicity

    x, f0_true, vuv, xh, xn = make_utterance(2, return_components=True)
    f0, t = world.harvest(x, FS)
    ap = world.d4c(x, f0, t, FS)
    edges = world._d4c_band_edges(FS)
    centers = (np.asarray(edges[:-1]) + np.asarray(edges[1:])) / 2
    nb = ap.shape[1]
    kc = np.round(centers / (FS / 2) * (nb - 1)).astype(int)
    true_ap = true_band_aperiodicity(xh, xn, f0_true, edges)
    n = min(len(f0), len(f0_true))
    v = (f0[:n] > 0) & (f0_true[:n] > 0)
    err = np.abs(ap[:n, kc][v] - true_ap[:n][v]).mean(axis=0)
    # bench (6 utterances): 0.060 / 0.105 / 0.161 per band
    assert err[0] < 0.12, err
    assert err[1] < 0.20, err
    assert err[2] < 0.28, err


@pytest.mark.parametrize("name,kw,gates", [
    # the hardest condition: base f0 declining to ~72 Hz, right at the
    # 71 Hz analysis floor (bench: core 0.052, mcd 1.98)
    ("f0_low_85hz", dict(base_f0=85.0),
     dict(vuv_error_core=0.12, copy_synthesis_mcd_db=2.6)),
    # fs=22050 exercises the ties-to-even C++ twin rounding parity that
    # fs=16000 never hits (bench: core 0.007, mcd 1.35)
    ("fs22050", dict(fs=22050),
     dict(vuv_error_core=0.05, copy_synthesis_mcd_db=1.9)),
    # pathological voice quality (bench: core 0.041, mcd 1.51)
    ("jitter_shimmer", dict(jitter=0.01, shimmer=0.10),
     dict(vuv_error_core=0.10, copy_synthesis_mcd_db=2.1)),
])
def test_stress_condition(name, kw, gates):
    """Per-condition fidelity gates (one utterance per condition for
    runtime; vocoder_fidelity.json carries the 2-utterance averages for
    every condition in copy_synthesis_bench.CONDITIONS)."""
    from copy_synthesis_bench import run_condition

    row = run_condition(kw, n_utts=1)
    for key, bound in gates.items():
        assert row[key] <= bound, (name, key, row)
    assert row["gross_error_rate"] <= 0.01, (name, row)


def test_checked_in_headline_is_healthy():
    """The committed vocoder_fidelity.json headline numbers, gated tight
    (these are averages over 6 utterances — deterministic given the code,
    so no flake margin is needed).  The per-class decomposition
    (tools/fidelity_decomp.py) is part of the contract: voiced-steady
    frames must stay near-transparent, and unvoiced frames must sit within
    1 dB of the chi^2 co-analysis floor measured alongside (the
    irreducible periodogram variance of comparing noise realizations)."""
    import json
    from os.path import join

    with open(join(REPO, "vocoder_fidelity.json")) as f:
        fid = json.load(f)
    assert fid["copy_synthesis_mcd_db"] <= 1.4
    assert fid["envelope_lsd_db"] <= 1.8
    assert fid["harvest"]["f0_rmse_hz"] <= 0.5
    assert fid["harvest"]["gross_error_rate"] == 0.0
    assert fid["d4c_voiced_allband_ap"] <= 0.2
    cls = fid["copy_synthesis_mcd_by_class"]
    floor = fid["unvoiced_coanalysis_floor_db"]
    assert cls["voiced_steady"] <= 0.4, cls
    assert cls["unvoiced_steady"] <= floor + 1.0, (cls, floor)
    # boundary class gated against ITS intrinsic floor: the phase/noise
    # co-render limit any non-phase-preserving vocoder faces (round-5
    # measurement: floor 1.40, system 1.66 after the cheaptrick unvoiced
    # sub-window clamp + harvest onset re-probe; round 4's 1.85 would trip
    # this gate)
    bfloor = fid["vuv_boundary_corender_floor_db"]
    assert cls["vuv_boundary"] <= 1.85, cls
    assert cls["vuv_boundary"] <= bfloor + 0.4, (cls, bfloor)


def test_checked_in_condition_rows_are_healthy():
    """The committed vocoder_fidelity.json must carry a row for every
    stress condition, each within the documented quality envelope."""
    import json
    from os.path import join

    from copy_synthesis_bench import CONDITIONS

    with open(join(REPO, "vocoder_fidelity.json")) as f:
        fid = json.load(f)
    rows = fid["conditions"]
    assert set(rows) == set(CONDITIONS)
    for name, row in rows.items():
        assert row["copy_synthesis_mcd_db"] <= 2.4, (name, row)
        assert row["vuv_error_core"] <= 0.10, (name, row)
        assert row["gross_error_rate"] <= 0.01, (name, row)
