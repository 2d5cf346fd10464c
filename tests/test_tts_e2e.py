"""Default-config TTS end-to-end smoke: prepare_features_tts.py ->
train.py (duration + acoustic) -> evaluation_tts.py on a synthetic
full-context corpus, exercising the shipped
``data/questions-radio_dnn_416.hed`` question set (reference
hparams.py:94-95 ships Merlin's via the nnmnkwii_gallery submodule).

The feature/stream config stays at DEFAULTS (order=59, 3 delta windows,
stream_sizes=[180,3,1,3], question_path default); only epoch counts and
model widths are shrunk so the chain runs in CI time.
"""

import json
import os
import subprocess
import sys
from glob import glob
from os.path import dirname, exists, join

import numpy as np
import pytest

REPO = dirname(dirname(os.path.abspath(__file__)))

from tests.fixtures import SMALL_D, SMALL_SRU, make_tts_corpus  # noqa: E402

pytestmark = pytest.mark.slow


def _run(args, timeout=900):
    # GANTTS_TPU_PLATFORM is the reliable CPU pin (sitecustomize imports
    # jax before JAX_PLATFORMS is honored — see CLAUDE.md)
    env = dict(os.environ, JAX_PLATFORMS="cpu", GANTTS_TPU_PLATFORM="cpu")
    r = subprocess.run([sys.executable] + args, capture_output=True,
                       text=True, cwd=REPO, env=env, timeout=timeout)
    assert r.returncode == 0, (args[0], r.stderr[-4000:])
    return r


@pytest.fixture(scope="module")
def tts_run(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tts_corpus"))
    feats = str(tmp_path_factory.mktemp("tts_feats"))
    make_tts_corpus(root, num=10)
    _run([join(REPO, "prepare_features_tts.py"), root,
          f"--dst_dir={feats}", "--workers=4"])
    return root, feats


def test_prepare_default_config_dims(tts_run):
    """Default question set must yield the reference's advertised dims:
    416 phone-level, 425 frame-level (416+9 subphone), 187 acoustic."""
    _, feats = tts_run
    xd = np.load(sorted(glob(join(feats, "X_duration", "*.npy")))[0])
    yd = np.load(sorted(glob(join(feats, "Y_duration", "*.npy")))[0])
    xa = np.load(sorted(glob(join(feats, "X_acoustic", "*.npy")))[0])
    ya = np.load(sorted(glob(join(feats, "Y_acoustic", "*.npy")))[0])
    assert xd.shape[-1] == 416
    assert yd.shape[-1] == 5
    assert xa.shape[-1] == 425
    assert ya.shape[-1] == 187
    # linguistic features must not be constant (questions actually fire)
    assert xd.std(axis=0).max() > 0
    assert np.isfinite(ya).all()


def test_tts_train_and_eval_default_config(tts_run, tmp_path):
    root, feats = tts_run
    ck_dur = str(tmp_path / "ck_dur")
    ck_ac = str(tmp_path / "ck_ac")

    _run([join(REPO, "train.py"), join(feats, "X_duration"),
          join(feats, "Y_duration"), "--hparams_name=tts_duration",
          f"--hparams=nepoch=1,batch_size=4,{SMALL_SRU},{SMALL_D}",
          "--w_d=0", f"--checkpoint-dir={ck_dur}",
          f"--log-event-path={tmp_path / 'log_dur'}"])
    _run([join(REPO, "train.py"), join(feats, "X_acoustic"),
          join(feats, "Y_acoustic"), "--hparams_name=tts_acoustic",
          f"--hparams=nepoch=1,batch_size=4,{SMALL_SRU},{SMALL_D}",
          "--w_d=0", f"--checkpoint-dir={ck_ac}",
          f"--log-event-path={tmp_path / 'log_ac'}"])

    out = str(tmp_path / "synth")
    _run([join(REPO, "evaluation_tts.py"),
          join(ck_ac, "checkpoint_epoch1_Generator.pth"),
          join(ck_dur, "checkpoint_epoch1_Generator.pth"),
          feats, join(root, "label_state_align"), out,
          f"--hparams_acoustic=nepoch=1,{SMALL_SRU},{SMALL_D}",
          f"--hparams_duration=nepoch=1,{SMALL_SRU},{SMALL_D}"])

    wavs = glob(join(out, "eval", "*.wav")) + glob(join(out, "test", "*.wav"))
    assert len(wavs) >= 2
    from scipy.io import wavfile
    fs, w = wavfile.read(wavs[0])
    assert fs == 16000 and len(w) > fs // 10  # >100 ms of audio
    assert np.isfinite(w.astype(np.float64)).all()
    assert np.abs(w).max() > 0

    # GV / modulation-spectrum quality report written alongside the audio
    with open(join(out, "analysis.json")) as f:
        report = json.load(f)
    assert "gv_generated_mean" in report and "gv_natural_mean" in report
    assert np.isfinite(report["gv_ratio"])

    # true-variance MLPG path (capability flag the reference lacks)
    out2 = str(tmp_path / "synth_tv")
    _run([join(REPO, "evaluation_tts.py"),
          join(ck_ac, "checkpoint_epoch1_Generator.pth"),
          join(ck_dur, "checkpoint_epoch1_Generator.pth"),
          feats, join(root, "label_state_align"), out2,
          "--true-variance-mlpg", "--post-filter",
          f"--hparams_acoustic=nepoch=1,{SMALL_SRU},{SMALL_D}",
          f"--hparams_duration=nepoch=1,{SMALL_SRU},{SMALL_D}"])
    wavs2 = glob(join(out2, "eval", "*.wav")) + glob(join(out2, "test",
                                                          "*.wav"))
    assert len(wavs2) == len(wavs)
