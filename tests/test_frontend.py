"""Vocoder front-end tests: mel-cepstrum transforms, MLSA filter (vs its
frequency-domain ground truth and vs the C++ port), WORLD-equivalent
analysis/synthesis on synthetic signals with known F0, DTW/banded-solver
native kernels vs their NumPy/SciPy oracles."""

import numpy as np
import pytest

from gantts_tpu.frontend import native, sptk, world


def synth_harmonic(fs=16000, f0=120.0, dur=0.6, formants=((700, 80), (1200, 120))):
    """Synthetic vowel-like signal: pulse train through resonators."""
    import scipy.signal

    n = int(fs * dur)
    x = np.zeros(n)
    period = fs / f0
    pos = 0.0
    while pos < n:
        x[int(pos)] = 1.0
        pos += period
    for fc, bw in formants:
        r = np.exp(-np.pi * bw / fs)
        theta = 2 * np.pi * fc / fs
        b, a = [1.0], [1.0, -2 * r * np.cos(theta), r * r]
        x = scipy.signal.lfilter(b, a, x)
    return x / np.abs(x).max()


# ---------------- mel-cepstrum transforms ----------------

def test_mcepalpha_known_values():
    assert abs(sptk.mcepalpha(16000) - 0.42) < 0.01
    assert abs(sptk.mcepalpha(44100) - 0.544) < 0.015
    assert abs(sptk.mcepalpha(8000) - 0.31) < 0.015


def test_sp2mc_mc2sp_roundtrip():
    """mc2sp(sp2mc(sp)) must reproduce a smooth spectrum closely."""
    fs, fftlen = 16000, 1024
    n = fftlen // 2 + 1
    f = np.linspace(0, fs / 2, n)
    logsp = -2.0 - 1.5e-3 * f / 100 + 0.8 * np.exp(-((f - 800) / 300) ** 2)
    sp = np.exp(2 * logsp)[None, :]
    alpha = 0.42
    mc = sptk.sp2mc(sp, order=59, alpha=alpha)
    sp_rec = sptk.mc2sp(mc, alpha=alpha, fftlen=fftlen)
    err = np.abs(np.log(sp_rec) - np.log(sp)).max()
    assert err < 0.1, f"log-spectral roundtrip error {err}"


def test_mc2b_b2mc_roundtrip():
    rng = np.random.RandomState(0)
    mc = rng.randn(7, 25)
    b = sptk.mc2b(mc, 0.42)
    assert np.allclose(sptk.b2mc(b, 0.42), mc, atol=1e-12)


def test_freqt_inverse():
    rng = np.random.RandomState(1)
    c = rng.randn(3, 30) * np.exp(-0.2 * np.arange(30))
    warped = sptk.freqt(c, 120, 0.42)
    back = sptk.freqt(warped, 29, -0.42)
    assert np.abs(back - c).max() < 1e-10


# ---------------- MLSA filter ----------------

def _mlsa_ground_truth_ir(b, alpha, fftlen=4096, n_ir=512):
    """Impulse response of exp(sum b_m Phi_m) via frequency sampling."""
    w = 2 * np.pi * np.arange(fftlen // 2 + 1) / fftlen
    z1 = np.exp(-1j * w)
    A = (z1 - alpha) / (1 - alpha * z1)
    phi = np.zeros((len(b), len(w)), dtype=complex)
    phi[0] = 1.0
    if len(b) > 1:
        phi[1] = (1 - alpha ** 2) * z1 / (1 - alpha * z1)
        for m in range(2, len(b)):
            phi[m] = phi[m - 1] * A
    F = (b[:, None] * phi).sum(axis=0)  # includes the b0 gain term
    H = np.exp(F)
    return np.fft.irfft(H, fftlen)[:n_ir]


def test_mlsa_filter_matches_transfer_function():
    """Pure-Python MLSA impulse response ~= exp(F) frequency-domain IR."""
    rng = np.random.RandomState(0)
    order, alpha = 20, 0.42
    mc = rng.randn(order + 1) * np.exp(-0.5 * np.arange(order + 1))
    mc[0] = 0.0  # gain handled separately
    b = sptk.mc2b(mc, alpha)
    n = 256
    x = np.zeros(n)
    x[0] = 1.0
    y = sptk._mlsa_synthesis_py(x, b[None, :], alpha, hopsize=n)
    ir = _mlsa_ground_truth_ir(b, alpha, n_ir=n)
    err = np.abs(y - ir).max() / np.abs(ir).max()
    assert err < 0.02, f"MLSA IR relative error {err}"


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_mlsa_native_matches_python():
    rng = np.random.RandomState(1)
    order, alpha, hop = 12, 0.42, 40
    T = 5
    mc = rng.randn(T, order + 1) * 0.3
    b = sptk.mc2b(mc, alpha)
    x = rng.randn(T * hop)
    y_py = sptk._mlsa_synthesis_py(x, b, alpha, hop)
    y_cc = native.mlsa_synthesis(x, b, alpha, hop)
    assert np.abs(y_py - y_cc).max() < 1e-10


def test_mlsa_synthesis_stable_diffvc_regime():
    """MLSA must stay stable on DIFFVC-scale coefficients.

    The reference's only MLSA use is DIFFVC (evaluation_vc.py:93-102): the
    filter runs on the *difference* of two similar mel-cepstra with the power
    coefficient zeroed — small coefficients, well inside the Pade stability
    region.  (Extreme full-spectrum coefficients exceed Pade(5) validity for
    ANY MLSA implementation, SPTK included.)"""
    fs = 16000
    x = synth_harmonic(fs=fs, dur=0.3)
    f0, t = world.dio(x, fs)
    sp = world.cheaptrick(x, f0, t, fs)
    alpha = 0.42
    mc = sptk.sp2mc(sp, 24, alpha)
    mc_shift = np.roll(mc, 1, axis=0) * 1.05  # a "converted" nearby track
    diff = mc_shift - mc
    diff[:, 0] = 0.0  # remove power coefficient (evaluation_vc.py:96)
    b = sptk.mc2b(diff, alpha)
    y = sptk.mlsa_synthesis(x[: len(t) * 80], b, alpha, hopsize=80)
    assert np.isfinite(y).all()
    assert np.abs(y).max() < 50 * np.abs(x).max()


# ---------------- WORLD-equivalent analysis ----------------

def test_dio_stonemask_known_f0():
    fs, true_f0 = 16000, 120.0
    x = synth_harmonic(fs=fs, f0=true_f0)
    f0, t = world.dio(x, fs)
    voiced = f0 > 0
    assert voiced.mean() > 0.5, "most frames should be voiced"
    med = np.median(f0[voiced])
    assert abs(med - true_f0) / true_f0 < 0.05, f"dio median {med}"
    refined = world.stonemask(x, f0, t, fs)
    med_r = np.median(refined[refined > 0])
    assert abs(med_r - true_f0) / true_f0 < 0.02, f"stonemask median {med_r}"
    # refinement should not be worse on average
    err0 = np.abs(f0[voiced] - true_f0).mean()
    err1 = np.abs(refined[voiced] - true_f0).mean()
    assert err1 <= err0 * 1.1


def test_dio_silence_is_unvoiced():
    fs = 16000
    x = np.random.RandomState(0).randn(8000) * 1e-6
    f0, t = world.dio(x, fs)
    assert (f0 == 0).mean() > 0.9


def test_harvest_contract():
    fs = 16000
    x = synth_harmonic(fs=fs, f0=150.0)
    f0, t = world.harvest(x, fs)
    assert f0.shape == t.shape
    v = f0 > 0
    assert v.mean() > 0.5
    assert abs(np.median(f0[v]) - 150.0) < 8.0


def test_cheaptrick_formant_peak():
    fs = 16000
    x = synth_harmonic(fs=fs, f0=120.0, formants=((700, 80),))
    f0, t = world.dio(x, fs)
    f0 = world.stonemask(x, f0, t, fs)
    sp = world.cheaptrick(x, f0, t, fs)
    fft_size = (sp.shape[1] - 1) * 2
    assert fft_size == world.get_cheaptrick_fft_size(fs)
    freqs = np.arange(sp.shape[1]) * fs / fft_size
    mid = sp[len(sp) // 2]
    peak = freqs[np.argmax(mid)]
    assert 450 < peak < 1000, f"envelope peak at {peak} Hz, expected ~700"
    assert (sp > 0).all() and np.isfinite(sp).all()


def test_aperiodicity_code_decode():
    fs = 16000
    x = synth_harmonic(fs=fs)
    f0, t = world.dio(x, fs)
    ap = world.d4c(x, f0, t, fs)
    assert ((ap > 0) & (ap <= 1)).all()
    # voiced frames of a pulse train should be mostly periodic at low freq
    voiced = f0 > 0
    assert ap[voiced, : ap.shape[1] // 4].mean() < 0.7
    coded = world.code_aperiodicity(ap, fs)
    assert coded.shape == (len(f0), world.num_coded_aperiodicities(fs))
    assert world.num_coded_aperiodicities(16000) == 1  # bap static dim parity
    fft_size = (ap.shape[1] - 1) * 2
    dec = world.decode_aperiodicity(coded, fs, fft_size)
    assert dec.shape == ap.shape
    assert ((dec > 0) & (dec <= 1)).all()


def test_analysis_synthesis_roundtrip():
    """synthesize(analyze(x)) must preserve F0 and produce sane audio."""
    fs, true_f0 = 16000, 130.0
    x = synth_harmonic(fs=fs, f0=true_f0, dur=0.5)
    f0, t = world.dio(x, fs)
    f0 = world.stonemask(x, f0, t, fs)
    sp = world.cheaptrick(x, f0, t, fs)
    ap = world.d4c(x, f0, t, fs)
    y = world.synthesize(f0, sp, ap, fs)
    assert np.isfinite(y).all()
    assert len(y) == int(len(f0) * fs * 0.005)
    assert np.abs(y).max() > 1e-6, "synthesis produced silence"
    # re-analyze: F0 must survive the roundtrip
    f0_2, t2 = world.dio(y / max(np.abs(y).max(), 1e-9), fs)
    v = f0_2 > 0
    assert v.mean() > 0.4
    med = np.median(f0_2[v])
    assert abs(med - true_f0) / true_f0 < 0.06, f"roundtrip f0 {med}"


# ---------------- native kernels vs oracles ----------------

@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_dtw_matches_python():
    from gantts_tpu.preprocessing.alignment import _dtw_path_numpy

    rng = np.random.RandomState(0)
    x = rng.randn(60, 5)
    y = np.vstack([x[:30], x[25:]])[:65] + 0.01 * rng.randn(65, 5)
    px_py, py_py = _dtw_path_numpy(x, y)
    px_cc, py_cc = native.dtw_path(x, y)
    assert np.array_equal(px_py, px_cc)
    assert np.array_equal(py_py, py_cc)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_banded_solve_matches_scipy():
    import scipy.linalg

    from gantts_tpu.core.windows import DEFAULT_WINDOWS, _banded_precision

    T = 50
    ab = _banded_precision(DEFAULT_WINDOWS, T)
    rng = np.random.RandomState(0)
    rhs = rng.randn(T, 4)
    ref = scipy.linalg.solveh_banded(ab, rhs, lower=False)
    out = native.banded_cholesky_solve(ab, rhs, bandwidth=ab.shape[0] - 1)
    assert np.abs(out - ref).max() < 1e-8


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_world_synthesize_matches_python(monkeypatch):
    """The C++ event-based synthesis engine must reproduce the NumPy oracle
    sample-for-sample (identical event table + noise stream, FFT rounding
    only)."""
    if not native.has_world_synth_events():
        pytest.skip("library built without world_synth_events")
    rs = np.random.RandomState(0)
    fs, T = 16000, 60
    n_bins = world.get_cheaptrick_fft_size(fs) // 2 + 1
    f0 = np.zeros(T)
    f0[10:40] = 150.0 + 5 * np.sin(np.linspace(0, 3, 30))
    freq = np.linspace(0, fs / 2, n_bins)
    sp = np.exp(-freq / 3000.0)[None, :] * (1 + 0.1 * rs.rand(T, n_bins))
    ap = np.clip(0.1 + 0.5 * rs.rand(T, n_bins), 1e-6, 1 - 1e-6)

    y_cc = world.synthesize(f0, sp, ap, fs)

    monkeypatch.setattr(native, "has_world_synth_events", lambda: False)
    y_py = world.synthesize(f0, sp, ap, fs)

    assert y_cc.shape == y_py.shape
    scale = np.abs(y_py).max()
    assert scale > 0
    assert np.abs(y_cc - y_py).max() < 1e-6 * scale, \
        np.abs(y_cc - y_py).max() / scale


# ---------------- C++ WORLD analysis engine vs NumPy oracles ----------------

def _analysis_fixture(fs=16000, dur=1.2):
    """Vibrato harmonic signal with silence head/tail and a known contour."""
    rs = np.random.RandomState(7)
    t = np.arange(int(fs * dur)) / fs
    f0c = 140 + 20 * np.sin(2 * np.pi * 2.0 * t)
    ph = 2 * np.pi * np.cumsum(f0c) / fs
    x = np.sin(ph) + 0.5 * np.sin(2 * ph) + 0.3 * np.sin(3 * ph)
    x[: int(0.1 * fs)] = 0.0
    x += 0.02 * rs.randn(len(x))
    hop = 0.005
    T = int(len(x) / fs / hop) + 1
    tp = np.arange(T) * hop
    f0 = np.where((tp > 0.15) & (tp < dur - 0.1),
                  140 + 20 * np.sin(2 * np.pi * 2.0 * tp), 0.0)
    return x, f0, tp, fs


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_ncc_refine_matches_python():
    if not native.has_analysis():
        pytest.skip("library built without the analysis engine")
    x, f0, tp, fs = _analysis_fixture()
    r_cc, p_cc = native.ncc_refine(x, f0, tp, fs)
    r_py, p_py = world._ncc_refine_py(x, f0, tp, fs)
    np.testing.assert_allclose(r_cc, r_py, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(p_cc, p_py, rtol=1e-9, atol=1e-9)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_coherence_gate_matches_python():
    if not native.has_coherence_gate():
        pytest.skip("library built without the coherence gate")
    x, f0, tp, fs = _analysis_fixture()
    # mix in formant-ringing-style false candidates so the gate fires
    rs = np.random.RandomState(7)
    f0_mixed = f0.copy()
    uv = f0 == 0
    f0_mixed[uv] = rs.uniform(650, 780, uv.sum())  # ringing-band probes
    g_cc = native.coherence_gate(x, f0_mixed, tp, fs, 0.012, 0.5, 0.08)
    g_py = world._coherence_gate_py(x, f0_mixed, tp, fs)
    np.testing.assert_allclose(g_cc, g_py, rtol=1e-9, atol=1e-9)
    # f0_mixed has no zeros, so any zero in the output proves the gate fired
    assert (g_cc == 0).any(), "fixture never exercised the gate"


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_subharmonic_fix_matches_python():
    if not native.has_analysis():
        pytest.skip("library built without the analysis engine")
    x, f0, tp, fs = _analysis_fixture()
    # feed octave-up errors so the correction path actually fires
    f0_bad = np.where(f0 > 0, f0 * 2.0, 0.0)
    s_cc = native.subharmonic_fix(x, f0_bad, tp, fs, 71.0)
    s_py = world._subharmonic_fix_py(x, f0_bad, tp, fs, 71.0)
    np.testing.assert_allclose(s_cc, s_py, rtol=1e-9, atol=1e-9)
    assert (s_cc != f0_bad).any(), "fixture never exercised the correction"


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_cheaptrick_matches_python(monkeypatch):
    if not native.has_analysis():
        pytest.skip("library built without the analysis engine")
    x, f0, tp, fs = _analysis_fixture(dur=0.6)
    sp_cc = world.cheaptrick(x, f0, tp, fs)
    monkeypatch.setattr(native, "has_analysis", lambda: False)
    sp_py = world.cheaptrick(x, f0, tp, fs)
    assert sp_cc.shape == sp_py.shape
    np.testing.assert_allclose(sp_cc, sp_py, rtol=1e-7)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_d4c_matches_python(monkeypatch):
    if not native.has_d4c_band_cplx():
        pytest.skip("library built without d4c_band_cplx")
    x, f0, tp, fs = _analysis_fixture(dur=0.6)
    ap_cc = world.d4c(x, f0, tp, fs)
    monkeypatch.setattr(native, "has_d4c_band_cplx", lambda: False)
    ap_py = world.d4c(x, f0, tp, fs)
    assert ap_cc.shape == ap_py.shape
    np.testing.assert_allclose(ap_cc, ap_py, rtol=1e-7, atol=1e-9)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_harvest_dio_match_python(monkeypatch):
    """dio/harvest route their per-frame NCC loops through C++; the full
    contours must agree with the all-Python path (same thresholds, rounding
    differences only at strict-inequality gate boundaries)."""
    if not native.has_analysis():
        pytest.skip("library built without the analysis engine")
    x, _, _, fs = _analysis_fixture()
    f0h_cc, tp_cc = world.harvest(x, fs)
    f0d_cc, _ = world.dio(x, fs)
    monkeypatch.setattr(native, "has_analysis", lambda: False)
    f0h_py, tp_py = world.harvest(x, fs)
    f0d_py, _ = world.dio(x, fs)
    np.testing.assert_allclose(tp_cc, tp_py)
    # voicing decisions threshold on NCC values; allow isolated flips at
    # gate boundaries, and require the voiced contours to agree closely
    for cc, py in ((f0h_cc, f0h_py), (f0d_cc, f0d_py)):
        both = (cc > 0) & (py > 0)
        assert both.mean() > 0.5, "fixture mostly voiced on both paths"
        assert ((cc > 0) != (py > 0)).mean() < 0.02
        np.testing.assert_allclose(cc[both], py[both], rtol=1e-6)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_non_pow2_fft_size_falls_back_to_numpy():
    """The C++ engine's FFT is radix-2 only: an explicit non-power-of-two
    fft_size (legal for the np.fft oracle) must take the NumPy path and
    still produce a correct envelope."""
    if not native.has_analysis():
        pytest.skip("library built without the analysis engine")
    x, f0, tp, fs = _analysis_fixture(dur=0.4)
    sp = world.cheaptrick(x, f0, tp, fs, fft_size=1000)
    assert sp.shape[1] == 1000 // 2 + 1
    assert np.isfinite(sp).all() and (sp > 0).all()
    # spectral peak should sit near the fundamental's harmonics region,
    # i.e. the envelope is not garbage
    assert sp[20].max() / sp[20].mean() > 2.0


def test_analysis_edge_cases_do_not_crash():
    """Tiny, silent, and extreme inputs must flow through the whole
    analysis chain (C++ or NumPy path alike) without crashing — guards the
    native engine's segment/lag boundary handling."""
    for fs in (8000, 16000):
        for x in (np.zeros(fs // 50),                       # 20 ms silence
                  np.random.RandomState(0).randn(fs // 100),  # 10 ms noise
                  np.sin(2 * np.pi * 790.0 / fs
                         * np.arange(fs // 4))):            # near f0_ceil
            x = np.asarray(x, dtype=np.float64)
            f0, tp = world.dio(x, fs)
            f0h, tph = world.harvest(x, fs)
            for f, t in ((f0, tp), (f0h, tph)):
                assert np.isfinite(f).all()
                sp = world.cheaptrick(x, f, t, fs)
                ap = world.d4c(x, f, t, fs)
                assert np.isfinite(sp).all() and (sp > 0).all()
                assert ((ap > 0) & (ap <= 1)).all()
                y = world.synthesize(f, sp, ap, fs)
                assert np.isfinite(y).all()


def test_stale_abi_library_is_refused(tmp_path, monkeypatch):
    """A prebuilt .so whose exported surface predates (or disagrees with)
    native._ABI must be REFUSED, not called: round 5 changed
    cheaptrick_frames's signature in place, and calling a stale library
    through the new ctypes prototypes is a SIGSEGV, not a catchable
    AttributeError.  Compiles two dummy libraries: one without the
    version symbol, one reporting a different ABI."""
    import shutil
    import subprocess

    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")

    def build(src_text, name):
        src = tmp_path / f"{name}.cpp"
        so = tmp_path / f"lib{name}.so"
        src.write_text(src_text)
        subprocess.run(["g++", "-shared", "-fPIC", "-o", str(so), str(src)],
                       check=True, capture_output=True)
        return str(so)

    no_sym = build("extern \"C\" int unrelated(void) { return 0; }", "nosym")
    wrong = build("extern \"C\" long long gantts_frontend_abi(void)"
                  "{ return %d; }" % (native._ABI + 1), "wrongabi")
    good = build(
        "extern \"C\" long long gantts_frontend_abi(void)"
        "{ return %d; }\n"
        "extern \"C\" void mlsa_synthesis(void) {}\n"
        "extern \"C\" void ola_add(void) {}\n"
        "extern \"C\" long long dtw_path(void) { return 0; }\n"
        "extern \"C\" int banded_cholesky_solve(void) { return 1; }\n"
        % native._ABI, "goodabi")

    def load_via(path):
        monkeypatch.setattr(native, "_LIB_PATHS", [path])
        monkeypatch.setenv("GANTTS_TPU_NO_NATIVE", "1")  # no auto-rebuild
        return native._load_locked()

    assert load_via(no_sym) is None
    assert load_via(wrong) is None
    # sanity: the gate itself is what refused them (a right-ABI dummy
    # passes the gate and only then would fail on missing entry points)
    lib = load_via(good)
    assert lib is not None
