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
    """Ceilings = the round-5 dossier's measured values +15% (round-3/4
    review ask).  Measured (scatter corpora, W_D=0.2 stage 5): VC baseline
    3.5589 / GAN 3.7777; TTS baseline 3.3717 / GAN 4.1885 dB; duration
    RMSE 1.1362 frames; vuv_err 0.0954.  These gate the CHECKED-IN
    results.json — a regeneration that blows past its own predecessor by
    >15% is a regression to investigate, not noise."""
    assert results["vc_in2out_baseline"]["test_mcd_db"] < 4.10
    assert results["vc_in2out_gan"]["test_mcd_db"] < 4.35
    assert results["tts_acoustic_baseline"]["test_mcd_db"] < 3.88
    assert results["tts_acoustic_gan"]["test_mcd_db"] < 4.82
    assert results["tts_duration"]["test_dur_rmse_frames"] < 1.31
    assert results["tts_acoustic_gan"]["test_vuv_err"] < 0.11


def test_gan_reduces_oversmoothing_vs_baseline(results):
    """The adversarial configs must beat (or match, with tolerance) the
    MGE-only baselines on BOTH oversmoothing measures."""
    for base_k, gan_k in [("vc_in2out_baseline", "vc_in2out_gan"),
                          ("tts_acoustic_baseline", "tts_acoustic_gan")]:
        base, gan = results[base_k], results[gan_k]
        # GV ratio (generated/natural mean GV): oversmoothing drives it
        # below 1.  The GAN must land at least as close to 1 as the
        # baseline (+0.02 tolerance) — measured round-5: VC 1.0413 ->
        # 1.0114 (strictly closer); TTS 0.9923 -> 1.0164 (both within
        # 2% of natural, covered by the 0.05 absolute allowance so a
        # near-natural pair isn't failed on basis-point jitter; the TTS
        # oversmoothing signal lives in the modspec deficit below, not
        # GV, on this corpus).  (The old 0.15 lenient cap is gone; the
        # diverged run this gate was first written against had gv_ratio
        # 0.0026 and fails every branch.)
        assert abs(1.0 - gan["gv_ratio"]) <= \
            max(abs(1.0 - base["gv_ratio"]) + 0.02, 0.05), \
            (base_k, base["gv_ratio"], gan["gv_ratio"])
        # High-band modulation-spectrum deficit vs natural (dB, positive =
        # under-modulated): where the baseline meaningfully oversmooths
        # (>= 3 dB deficit) the GAN must CUT the deficit by >= 15% (the
        # round-4 review's bar; measured: TTS 14.005 -> 10.861 = 0.776x,
        # VC 1.922 -> 0.565 = 0.294x); a near-transparent baseline only
        # requires no regression.
        if base["modspec_hi_band_deficit_db"] >= 3.0:
            assert gan["modspec_hi_band_deficit_db"] <= \
                0.85 * base["modspec_hi_band_deficit_db"], \
                (base_k, base["modspec_hi_band_deficit_db"],
                 gan["modspec_hi_band_deficit_db"])
        else:
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
