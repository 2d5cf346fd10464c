"""Demo-script composition tests (VERDICT round-1 item 10): drive
vc_demo.sh and tts_demo.sh end-to-end on synthetic corpora with tiny epoch
counts, so the full recipes (feature prep -> 5-stage curriculum ->
evaluation) are tested as SHIPPED, not just their ingredients."""

import os
import subprocess
from glob import glob
from os.path import dirname, join

import numpy as np

REPO = dirname(dirname(os.path.abspath(__file__)))

from tests.fixtures import (  # noqa: E402
    SMALL_D, SMALL_SRU, make_arctic_vc_corpus, make_tts_corpus)

import pytest  # noqa: E402

pytestmark = pytest.mark.slow  # deselect with -m "not slow"

SMALL_OVERRIDES = f"{SMALL_SRU},{SMALL_D},batch_size=4"


def _run_demo(script, script_args, cwd, env_extra, timeout=2400):
    env = dict(os.environ, JAX_PLATFORMS="cpu", GANTTS_TPU_PLATFORM="cpu",
               **env_extra)
    r = subprocess.run(["bash", join(REPO, script)] + script_args,
                       capture_output=True, text=True, cwd=cwd, env=env,
                       timeout=timeout)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])
    return r


def _check_wavs(pattern, minimum=1):
    wavs = glob(pattern)
    assert len(wavs) >= minimum, pattern
    from scipy.io import wavfile

    fs, w = wavfile.read(wavs[0])
    assert len(w) > fs // 20
    assert np.isfinite(w.astype(np.float64)).all()


def test_vc_demo_end_to_end(tmp_path):
    corpus = str(tmp_path / "arctic")
    make_arctic_vc_corpus(corpus, num=12)
    # nepoch=999 in HPARAMS_EXTRA is a regression guard: stage-critical
    # nepoch (train_gan.sh) must override user hparams, or the curriculum
    # trains 999 epochs and the checkpoint handoff contract breaks.
    _run_demo("vc_demo.sh", ["citest", corpus], cwd=str(tmp_path),
              env_extra={
                  "MAX_FILES": "12", "TOTAL_EPOCH": "3",
                  "G_WARMUP": "1", "D_WARMUP": "1",
                  "HPARAMS_EXTRA": "nepoch=999",
              })
    for kind in ("baseline", "gan"):
        _check_wavs(str(tmp_path / f"generated/vc_citest_{kind}"
                        / "*" / "*.wav"))


def test_tts_demo_end_to_end(tmp_path):
    corpus = str(tmp_path / "slt")
    make_tts_corpus(corpus, num=10)
    _run_demo("tts_demo.sh", ["citest", corpus], cwd=str(tmp_path),
              env_extra={
                  "DURATION_EPOCHS": "3", "ACOUSTIC_EPOCHS": "3",
                  "G_WARMUP": "1", "D_WARMUP": "1",
                  "HPARAMS_EXTRA": SMALL_OVERRIDES,
              })
    for kind in ("baseline", "gan"):
        _check_wavs(str(tmp_path / f"generated/tts_citest_{kind}"
                        / "*" / "*.wav"))
