"""Regression gate on the checked-in quality dossier (results.json).

The dossier (tools/quality_dossier.py) runs the five BASELINE.json configs
through the SHIPPED demo curricula (vc_demo.sh / tts_demo.sh ->
train_gan.sh -> evaluation_*) at demo scale and pins the final quality
numbers.  This test enforces (a) the schema — every config reports its
metrics, (b) sanity bounds on the absolute distortions, and (c) the
reference's notebook-published claim as numbers: adversarial training
reduces oversmoothing vs MGE-only — GV ratio closer to 1 and a smaller
high-band modulation-spectrum deficit vs natural (reference
notebooks/Test VC.ipynb role).
"""

import json
import os
from os.path import dirname, exists, join

import pytest

RESULTS = join(dirname(dirname(os.path.abspath(__file__))), "results.json")

pytestmark = pytest.mark.skipif(
    not exists(RESULTS), reason="results.json not generated yet "
    "(python tools/quality_dossier.py)")


@pytest.fixture(scope="module")
def results():
    with open(RESULTS) as f:
        return json.load(f)


ALL_CONFIGS = ["vc_in2out_baseline", "vc_in2out_gan", "tts_duration",
               "tts_acoustic_baseline", "tts_acoustic_gan"]


def test_all_five_configs_report(results):
    for key in ALL_CONFIGS:
        assert key in results, key
        vals = {k: v for k, v in results[key].items()
                if k != "wall_clock_s_full_demo"}
        assert vals, key
        for k, v in vals.items():
            assert v is not None, (key, k)
            assert v == v, (key, k, "NaN")  # NaN != NaN


def test_absolute_distortion_bounds(results):
    """Ceilings pinned from the demo-scale run this gate ships with
    (generous +~30% headroom for curriculum seed drift, not targets)."""
    assert results["vc_in2out_baseline"]["test_mcd_db"] < 6.5
    assert results["vc_in2out_gan"]["test_mcd_db"] < 6.5
    assert results["tts_acoustic_baseline"]["test_mcd_db"] < 6.5
    assert results["tts_acoustic_gan"]["test_mcd_db"] < 6.5
    assert results["tts_duration"]["test_dur_rmse_frames"] < 10.0
    assert results["tts_acoustic_gan"]["test_vuv_err"] < 0.25


def test_gan_reduces_oversmoothing_vs_baseline(results):
    """The adversarial configs must beat (or match, with tolerance) the
    MGE-only baselines on BOTH oversmoothing measures."""
    for base_k, gan_k in [("vc_in2out_baseline", "vc_in2out_gan"),
                          ("tts_acoustic_baseline", "tts_acoustic_gan")]:
        base, gan = results[base_k], results[gan_k]
        # GV ratio (generated/natural mean GV): oversmoothing drives it
        # below 1.  When the baseline itself oversmooths (<0.95) the GAN
        # must land closer to 1; when the baseline is already
        # GV-transparent there is nothing to improve on this measure
        # (the modspec gate below is then the binding one), so only
        # require the GAN to STAY near-natural — a collapsed stage
        # (e.g. the diverged run this gate was written against, gv_ratio
        # 0.0026) still fails loudly.
        if base["gv_ratio"] < 0.95:
            assert abs(1.0 - gan["gv_ratio"]) <= abs(1.0 - base["gv_ratio"]) \
                + 0.02, (base_k, base["gv_ratio"], gan["gv_ratio"])
        else:
            assert abs(1.0 - gan["gv_ratio"]) <= \
                max(0.15, abs(1.0 - base["gv_ratio"]) + 0.02), \
                (base_k, base["gv_ratio"], gan["gv_ratio"])
        # High-band modulation-spectrum deficit vs natural (dB, positive =
        # under-modulated): GAN must shrink it.
        assert gan["modspec_hi_band_deficit_db"] <= \
            base["modspec_hi_band_deficit_db"] + 0.1, \
            (base_k, base["modspec_hi_band_deficit_db"],
             gan["modspec_hi_band_deficit_db"])


def test_gan_does_not_blow_up_distortion(results):
    """Adversarial training trades a little MCD for texture; bound the
    trade so a diverging GAN stage cannot pass the oversmoothing gate by
    accident."""
    for base_k, gan_k in [("vc_in2out_baseline", "vc_in2out_gan"),
                          ("tts_acoustic_baseline", "tts_acoustic_gan")]:
        assert results[gan_k]["test_mcd_db"] <= \
            results[base_k]["test_mcd_db"] * 1.35 + 0.1, (base_k, gan_k)
