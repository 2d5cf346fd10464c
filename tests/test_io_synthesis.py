"""HTS/Merlin IO, post-filter and end-to-end inference-chain tests."""

import os
import sys
from os.path import dirname

import numpy as np
import pytest

REPO = dirname(dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.fixtures import make_label_file, make_question_file  # noqa: E402


@pytest.fixture()
def labq(tmp_path):
    lab = make_label_file(str(tmp_path / "utt.lab"))
    qst = make_question_file(str(tmp_path / "questions.hed"))
    return lab, qst


def test_hts_label_parsing(labq):
    from gantts_tpu.io import hts

    lab, _ = labq
    labels = hts.load(lab)
    assert labels.is_state_alignment
    assert labels.num_states == 5
    bounds = labels.phone_boundaries()
    assert len(bounds) == 6  # six phones
    assert all(e - s == 5 for s, e in bounds)
    assert labels.num_frames() == sum(labels.frame_counts())
    sil = labels.silence_phone_indices()
    assert list(sil) == [0, 5]
    sfi = labels.silence_frame_indices()
    # first phone's frames are silence
    assert sfi[0] == 0 and len(sfi) > 0


def test_question_set_and_linguistic_features(labq):
    from gantts_tpu.io import hts, merlin

    lab, qst = labq
    labels = hts.load(lab)
    binary_dict, continuous_dict = hts.load_question_set(qst)
    assert len(binary_dict) == 6 and len(continuous_dict) == 2

    # phone-level (duration model input)
    feats = merlin.linguistic_features(labels, binary_dict, continuous_dict,
                                       add_frame_features=False,
                                       subphone_features=None)
    assert feats.shape == (6, 8)
    # C-Silence fires for phones 0 and 5
    assert feats[0, 0] == 1 and feats[5, 0] == 1 and feats[2, 0] == 0
    # C-Vowel fires for ax (2) and ow (4)
    assert feats[2, 1] == 1 and feats[4, 1] == 1 and feats[1, 1] == 0
    # continuous: position in word = phone index + 1
    assert np.allclose(feats[:, 6], np.arange(1, 7))

    # frame-level with full subphone features (acoustic model input)
    ff = merlin.linguistic_features(labels, binary_dict, continuous_dict,
                                    add_frame_features=True,
                                    subphone_features="full")
    assert ff.shape == (labels.num_frames(), 8 + 9)
    # state index fw feature cycles within 1..5
    assert ff[:, 8 + 3].min() == 1 and ff[:, 8 + 3].max() == 5


def test_duration_features_and_set_durations(labq):
    from gantts_tpu.io import hts, merlin

    lab, _ = labq
    labels = hts.load(lab)
    dur = merlin.duration_features(labels)
    assert dur.shape == (6, 5)
    assert dur.sum() == labels.num_frames()

    # write back modified durations and check frame arithmetic
    new_dur = np.full((len(labels),), 3.0)
    labels.set_durations(new_dur)
    assert labels.num_frames() == 3 * len(labels)
    assert merlin.duration_features(labels).sum() == 3 * len(labels)


def test_merlin_post_filter():
    from gantts_tpu.frontend.sptk import mc2sp, sp2mc
    from gantts_tpu.postfilters import merlin_post_filter

    fs, fftlen, alpha = 16000, 1024, 0.42
    n = fftlen // 2 + 1
    f = np.linspace(0, fs / 2, n)
    # spectrum with a formant at 1 kHz
    logsp = -3.0 + 1.2 * np.exp(-((f - 1000) / 200) ** 2)
    sp = np.exp(2 * logsp)[None, :].repeat(4, axis=0)
    mgc = sp2mc(sp, order=24, alpha=alpha)
    mgc_p = merlin_post_filter(mgc, alpha, coef=1.4)
    assert mgc_p.shape == mgc.shape
    sp_p = mc2sp(mgc_p, alpha, fftlen)
    # formant contrast (peak-to-valley in log domain) must increase
    contrast = np.log(sp).max(axis=1) - np.log(sp).min(axis=1)
    contrast_p = np.log(sp_p).max(axis=1) - np.log(sp_p).min(axis=1)
    assert (contrast_p > contrast).all()
    # overall power stays within ~3 dB
    p0 = np.log(sp.mean(axis=1))
    p1 = np.log(sp_p.mean(axis=1))
    assert np.abs(p1 - p0).max() < 0.7


def test_vc_inference_chain():
    """vc_from_waveform through a random-init In2OutHighwayNet, both modes."""
    import jax

    from gantts_tpu import hparams
    from gantts_tpu.models import create_model
    from gantts_tpu.synthesis import vc_from_waveform
    from tests.test_frontend import synth_harmonic

    hp = hparams.vc.copy()
    hp.order = 24
    hp.stream_sizes = [24 * 3]
    hp.generator_params.update(in_dim=72, out_dim=72, static_dim=24,
                               num_hidden=1, hidden_dim=16)
    model = create_model(hp.generator, **hp.generator_params)
    x = synth_harmonic(fs=16000, f0=120.0, dur=0.4)
    x = (x * 2 ** 14).astype(np.float64)

    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 8, 72), np.float32),
        np.zeros((8, 24), np.float32))
    mean = np.zeros(72)
    std = np.ones(72)
    for diffvc in (True, False):
        wav, inputs, outputs = vc_from_waveform(
            model, variables, x, 16000, mean, std, hp, diffvc=diffvc)
        assert np.isfinite(wav).all(), f"diffvc={diffvc}"
        assert len(wav) > 0
        assert inputs.shape[1] == 24 and outputs.shape[1] == 24


def test_tts_inference_chain(labq, tmp_path):
    """gen_duration + tts_from_label through random-init tiny models."""
    import jax

    from gantts_tpu import hparams
    from gantts_tpu.io import hts
    from gantts_tpu.models import create_model
    from gantts_tpu.synthesis import tts_from_label

    lab, qst = labq
    binary_dict, continuous_dict = hts.load_question_set(qst)
    lin_dim = 8

    hp_dur = hparams.tts_duration.copy()
    hp_dur.question_path = qst
    hp_dur.generator_params.update(in_dim=lin_dim, out_dim=5, num_hidden=1,
                                   hidden_dim=8)
    hp_ac = hparams.tts_acoustic.copy()
    hp_ac.question_path = qst
    hp_ac.stream_sizes = [30, 3, 1, 3]
    hp_ac.order = 10
    hp_ac.generator_params.update(in_dim=lin_dim + 9, out_dim=37,
                                  num_hidden=1, hidden_dim=8)

    key = jax.random.PRNGKey(0)
    models, variables = {}, {}
    models["duration"] = create_model(hp_dur.generator,
                                      **hp_dur.generator_params)
    variables["duration"] = models["duration"].init(
        key, np.zeros((1, 4, lin_dim), np.float32),
        np.full((1,), 4, np.int32))
    models["acoustic"] = create_model(hp_ac.generator,
                                      **hp_ac.generator_params)
    variables["acoustic"] = models["acoustic"].init(
        key, np.zeros((1, 4, lin_dim + 9), np.float32),
        np.full((1,), 4, np.int32))

    X_min = {"duration": np.zeros(lin_dim), "acoustic": np.zeros(lin_dim + 9)}
    X_max = {"duration": np.ones(lin_dim), "acoustic": np.ones(lin_dim + 9)}
    # lf0 mean ~5 so exp(lf0) is a sane f0; vuv mean 0.5
    Y_mean = {"duration": np.full(5, 4.0), "acoustic": np.zeros(37)}
    Y_mean["acoustic"][30] = 5.0
    Y_mean["acoustic"][33] = 0.5
    Y_std = {"duration": np.ones(5), "acoustic": np.full(37, 0.1)}

    wav, mgc, lf0, vuv, bap = tts_from_label(
        models, variables, lab, X_min, X_max, Y_mean, Y_std,
        hp_dur, hp_ac, binary_dict, continuous_dict, post_filter=True,
        fs=16000)
    assert np.isfinite(wav).all()
    assert np.abs(wav).max() <= 32767.01
    assert mgc.shape[1] == 10  # 30 / 3 windows
    # without the duration model (label timings)
    wav2, *_ = tts_from_label(
        models, variables, lab, X_min, X_max, Y_mean, Y_std,
        hp_dur, hp_ac, binary_dict, continuous_dict,
        apply_duration_model=False, fs=16000)
    assert np.isfinite(wav2).all()


def test_run_utterance_jobs_order_and_errors():
    """The shared eval fan-out must preserve job order (threaded and
    serial) and propagate a worker exception rather than swallow it."""
    import pytest

    from gantts_tpu.utils.analysis import run_utterance_jobs

    jobs = [(i, 2 * i) for i in range(20)]

    def work(a, b):
        return a + b

    serial = run_utterance_jobs(work, jobs, workers=1)
    threaded = run_utterance_jobs(work, jobs, workers=4)
    assert serial == threaded == [3 * i for i in range(20)]

    def boom(a, b):
        if a == 7:
            raise ValueError("utterance 7 failed")
        return a

    with pytest.raises(ValueError, match="utterance 7"):
        run_utterance_jobs(boom, jobs, workers=4)
    with pytest.raises(ValueError, match="utterance 7"):
        run_utterance_jobs(boom, jobs, workers=1)


def test_analysis_report_curves_and_figures(tmp_path):
    """analysis.json carries the per-dimension GV and modspec curves, and
    tools/report.py renders the notebook-style comparison figures from it."""
    import json
    import subprocess
    import sys
    from os.path import dirname, exists, join

    from gantts_tpu.utils.analysis import write_analysis_report

    rs = np.random.RandomState(0)
    nat_dir = str(tmp_path / "natural")
    os.makedirs(nat_dir)
    for i in range(4):
        np.save(join(nat_dir, f"u{i}.npy"),
                (rs.randn(200, 30).cumsum(0) * 0.05).astype(np.float32))
    gen = [(rs.randn(200, 30).cumsum(0) * 0.05).astype(np.float32)
           for _ in range(3)]
    path = str(tmp_path / "analysis.json")
    write_analysis_report(path, gen, nat_dir, static_dim=30, modfs=200.0)

    with open(path) as f:
        rep = json.load(f)
    assert len(rep["gv_generated"]) == 30
    assert len(rep["gv_natural"]) == 30
    assert len(rep["modspec_generated_db"]) == len(rep["modspec_freqs_hz"])
    assert np.isfinite(rep["gv_ratio"])

    repo = dirname(dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "figs")
    r = subprocess.run(
        [sys.executable, join(repo, "tools", "report.py"), path,
         "--labels", "run", "--out", out],
        capture_output=True, text=True,
        env={**os.environ, "GANTTS_TPU_PLATFORM": "cpu"})
    assert r.returncode == 0, r.stderr
    assert exists(join(out, "gv.png"))
    assert exists(join(out, "modspec.png"))
