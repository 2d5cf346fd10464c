"""ctypes bindings for the C++ host library (cpp/frontend.cpp).

Loads ``libgantts_frontend.so`` from cpp/build (building it on first use if
a toolchain is present); every entry point falls back to the NumPy oracle in
its home module when the library is unavailable, so the framework remains
fully functional without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from os.path import dirname, exists, join

import numpy as np

_REPO = dirname(dirname(dirname(os.path.abspath(__file__))))
_LIB_PATHS = [
    join(_REPO, "cpp", "build", "libgantts_frontend.so"),
    join(_REPO, "cpp", "libgantts_frontend.so"),
]

# Expected ABI of the exported surface (cpp/frontend.cpp
# gantts_frontend_abi).  A library reporting anything else is refused:
# signatures have changed in place before (round 5: cheaptrick_frames
# gained uv_clamp mid-argument-list), and calling a stale .so through the
# new ctypes prototypes is undefined behavior (SIGSEGV), not a clean
# AttributeError the per-symbol guards below could catch.
_ABI = 2

_lib = None
_tried = False
# Eval CLIs fan work out over threads (--workers); first use would otherwise
# race the auto-build (subprocess.run releases the GIL) and could CDLL a
# half-written .so.
_load_lock = threading.Lock()


def _build():
    src_dir = join(_REPO, "cpp")
    build_dir = join(src_dir, "build")
    try:
        subprocess.run(["cmake", "-S", src_dir, "-B", build_dir,
                        "-DCMAKE_BUILD_TYPE=Release"],
                       check=True, capture_output=True, timeout=120)
        subprocess.run(["cmake", "--build", build_dir, "-j"],
                       check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    with _load_lock:
        if _tried:  # another thread finished while we waited
            return _lib
        lib = _load_locked()
        _lib = lib
        _tried = True
        return _lib


def _sources_newer_than(lib_path):
    """True if any C++ source/buildfile is newer than the built library.

    Checked BEFORE dlopen: rebuilding after CDLL would not help (dlopen
    of the same path returns the already-mapped stale image while a
    handle is live)."""
    try:
        lib_mtime = os.path.getmtime(lib_path)
    except OSError:
        return True
    for src in ("frontend.cpp", "CMakeLists.txt"):
        try:
            if os.path.getmtime(join(_REPO, "cpp", src)) > lib_mtime:
                return True
        except OSError:
            pass
    return False


def _load_locked():
    for p in _LIB_PATHS:
        if exists(p):
            break
    else:
        if os.environ.get("GANTTS_TPU_NO_NATIVE"):
            return None
        if not _build():
            return None
        p = _LIB_PATHS[0]
        if not exists(p):
            return None
    if p == _LIB_PATHS[0] and _sources_newer_than(p) \
            and not os.environ.get("GANTTS_TPU_NO_NATIVE"):
        _build()  # stale in-repo build: refresh before first dlopen
    try:
        lib = ctypes.CDLL(p)
    except OSError:
        return None

    # Hard ABI gate (see _ABI).  Missing symbol = pre-versioning build.
    try:
        lib.gantts_frontend_abi.restype = ctypes.c_longlong
        if int(lib.gantts_frontend_abi()) != _ABI:
            return None
    except AttributeError:
        return None

    c_double_p = ctypes.POINTER(ctypes.c_double)
    c_int32_p = ctypes.POINTER(ctypes.c_int32)

    try:
        _bind_base(lib, c_double_p, c_int32_p)
    except AttributeError:  # right ABI but missing base entry points
        return None
    return lib


def _bind_base(lib, c_double_p, c_int32_p):
    lib.mlsa_synthesis.argtypes = [
        c_double_p, ctypes.c_int64, c_double_p, ctypes.c_int64,
        ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_int, c_double_p]
    lib.mlsa_synthesis.restype = None

    lib.ola_add.argtypes = [
        c_double_p, ctypes.c_int64, c_double_p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_double]
    lib.ola_add.restype = None

    lib.dtw_path.argtypes = [
        c_double_p, ctypes.c_int64, c_double_p, ctypes.c_int64,
        ctypes.c_int64, c_int32_p, c_int32_p]
    lib.dtw_path.restype = ctypes.c_int64

    lib.banded_cholesky_solve.argtypes = [
        c_double_p, ctypes.c_int64, ctypes.c_int, c_double_p, ctypes.c_int64]
    lib.banded_cholesky_solve.restype = ctypes.c_int

    try:
        c_int64_p = ctypes.POINTER(ctypes.c_int64)
        c_uint8_p = ctypes.POINTER(ctypes.c_uint8)
        lib.world_synth_events.argtypes = [
            c_double_p, c_double_p, ctypes.c_int64, ctypes.c_int64,
            c_double_p, c_uint8_p, c_double_p, c_int64_p, c_int64_p,
            ctypes.c_int64, c_double_p, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, c_double_p, ctypes.c_int64]
        lib.world_synth_events.restype = None
    except AttributeError:  # stale library build without the synth engine
        lib.world_synth_events = None

    try:
        lib.ncc_refine.argtypes = [
            c_double_p, ctypes.c_int64, c_double_p, c_double_p,
            ctypes.c_int64, ctypes.c_double, c_double_p, c_double_p]
        lib.ncc_refine.restype = None
        lib.subharmonic_fix.argtypes = [
            c_double_p, ctypes.c_int64, c_double_p, c_double_p,
            ctypes.c_int64, ctypes.c_double, ctypes.c_double, ctypes.c_int,
            ctypes.c_double, c_double_p]
        lib.subharmonic_fix.restype = None
        lib.cheaptrick_frames.argtypes = [
            c_double_p, ctypes.c_int64, c_double_p, c_double_p,
            ctypes.c_int64, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_int, ctypes.c_int, c_double_p]
        lib.cheaptrick_frames.restype = None
        lib.d4c_band_cplx.argtypes = [
            c_double_p, c_double_p, ctypes.c_int64, ctypes.c_int64,
            c_double_p, c_double_p, ctypes.c_int64, ctypes.c_double,
            ctypes.c_double, ctypes.c_int, c_double_p]
        lib.d4c_band_cplx.restype = None
    except AttributeError:  # stale library build without the analysis engine
        lib.ncc_refine = None
        lib.d4c_band_cplx = None

    try:
        lib.coherence_gate.argtypes = [
            c_double_p, ctypes.c_int64, c_double_p, c_double_p,
            ctypes.c_int64, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, c_double_p]
        lib.coherence_gate.restype = None
    except AttributeError:  # stale build without the coherence gate
        lib.coherence_gate = None

    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def mlsa_synthesis(excitation, b_frames, alpha, hopsize, pd=5):
    lib = _load()
    excitation = np.ascontiguousarray(excitation, dtype=np.float64)
    b_frames = np.ascontiguousarray(b_frames, dtype=np.float64)
    out = np.zeros_like(excitation)
    lib.mlsa_synthesis(
        _ptr(excitation), len(excitation), _ptr(b_frames),
        b_frames.shape[0], b_frames.shape[1] - 1,
        ctypes.c_double(alpha), int(hopsize), int(pd), _ptr(out))
    return out


def has_world_synth_events() -> bool:
    lib = _load()
    return lib is not None and \
        getattr(lib, "world_synth_events", None) is not None


def world_synth_events(sp, ap, times, voiced, f_at, noffs, nlens, noise,
                       hop, fs, n_out):
    """Event-based WORLD-style synthesis in C++ (cpp/frontend.cpp).

    The event table (pulse times incl. sub-sample position, voicing flags,
    per-event f0, noise segment offsets/lengths) and the noise stream are
    computed by the caller (world._synthesis_events) so the C++ and NumPy
    renderers consume identical inputs and agree to FFT rounding."""
    lib = _load()
    sp = np.ascontiguousarray(sp, dtype=np.float64)
    ap = np.ascontiguousarray(ap, dtype=np.float64)
    times = np.ascontiguousarray(times, dtype=np.float64)
    voiced = np.ascontiguousarray(voiced, dtype=np.uint8)
    f_at = np.ascontiguousarray(f_at, dtype=np.float64)
    noffs = np.ascontiguousarray(noffs, dtype=np.int64)
    nlens = np.ascontiguousarray(nlens, dtype=np.int64)
    noise = np.ascontiguousarray(noise, dtype=np.float64)
    T, n_bins = sp.shape
    fft_size = (n_bins - 1) * 2
    out = np.zeros(n_out + 2 * fft_size, dtype=np.float64)
    lib.world_synth_events(
        _ptr(sp), _ptr(ap), T, n_bins, _ptr(times),
        voiced.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _ptr(f_at),
        noffs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        nlens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(times), _ptr(noise), len(noise),
        ctypes.c_double(float(hop)), ctypes.c_double(float(fs)),
        _ptr(out), int(n_out))
    return out[:n_out]


def has_analysis() -> bool:
    """True if the library ships the WORLD analysis engine (ncc_refine &c)."""
    lib = _load()
    return lib is not None and getattr(lib, "ncc_refine", None) is not None


def ncc_refine(x, f0, temporal_positions, fs):
    """C++ twin of world.py _ncc_refine; returns (refined, peak_r)."""
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float64)
    f0 = np.ascontiguousarray(f0, dtype=np.float64)
    tpos = np.ascontiguousarray(temporal_positions, dtype=np.float64)
    refined = f0.copy()
    peak_r = np.zeros_like(f0)
    lib.ncc_refine(_ptr(x), len(x), _ptr(f0), _ptr(tpos), len(f0),
                   ctypes.c_double(float(fs)), _ptr(refined), _ptr(peak_r))
    return refined, peak_r


def has_coherence_gate() -> bool:
    lib = _load()
    return lib is not None and getattr(lib, "coherence_gate", None) is not None


def coherence_gate(x, f0, temporal_positions, fs, horizon_s, thresh, tol):
    """C++ twin of world.py _coherence_gate_py; returns the gated f0."""
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float64)
    f0 = np.ascontiguousarray(f0, dtype=np.float64)
    tpos = np.ascontiguousarray(temporal_positions, dtype=np.float64)
    out = f0.copy()
    lib.coherence_gate(_ptr(x), len(x), _ptr(f0), _ptr(tpos), len(f0),
                       ctypes.c_double(float(fs)),
                       ctypes.c_double(float(horizon_s)),
                       ctypes.c_double(float(thresh)),
                       ctypes.c_double(float(tol)), _ptr(out))
    return out


def subharmonic_fix(x, f0, temporal_positions, fs, f0_floor,
                    max_div=6, improvement=0.12):
    """C++ twin of world.py _subharmonic_fix; returns the corrected f0."""
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float64)
    f0 = np.ascontiguousarray(f0, dtype=np.float64)
    tpos = np.ascontiguousarray(temporal_positions, dtype=np.float64)
    out = f0.copy()
    lib.subharmonic_fix(_ptr(x), len(x), _ptr(f0), _ptr(tpos), len(f0),
                        ctypes.c_double(float(fs)),
                        ctypes.c_double(float(f0_floor)), int(max_div),
                        ctypes.c_double(float(improvement)), _ptr(out))
    return out


def cheaptrick_frames(x, f0, temporal_positions, fs, q1, f0_floor, fft_size,
                      uv_clamp=True):
    """C++ twin of world.py cheaptrick's frame loop; (T, fft//2+1) power."""
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float64)
    f0 = np.ascontiguousarray(f0, dtype=np.float64)
    tpos = np.ascontiguousarray(temporal_positions, dtype=np.float64)
    sp = np.empty((len(f0), fft_size // 2 + 1), dtype=np.float64)
    lib.cheaptrick_frames(_ptr(x), len(x), _ptr(f0), _ptr(tpos), len(f0),
                          ctypes.c_double(float(fs)),
                          ctypes.c_double(float(q1)),
                          ctypes.c_double(float(f0_floor)), int(fft_size),
                          int(bool(uv_clamp)), _ptr(sp))
    return sp


def has_d4c_band_cplx() -> bool:
    lib = _load()
    return lib is not None and \
        getattr(lib, "d4c_band_cplx", None) is not None


def d4c_band_cplx(band_re, band_im, f0, temporal_positions, fs,
                  sub_periods, n_sub):
    """C++ twin of world.py _band_ap_subcplx_py; (T, n_bands) band ap."""
    lib = _load()
    band_re = np.ascontiguousarray(band_re, dtype=np.float64)
    band_im = np.ascontiguousarray(band_im, dtype=np.float64)
    f0 = np.ascontiguousarray(f0, dtype=np.float64)
    tpos = np.ascontiguousarray(temporal_positions, dtype=np.float64)
    n_bands, n = band_re.shape
    band_ap = np.full((len(f0), n_bands), 1.0 - 1e-12, dtype=np.float64)
    lib.d4c_band_cplx(_ptr(band_re), _ptr(band_im), n_bands, n, _ptr(f0),
                      _ptr(tpos), len(f0), ctypes.c_double(float(fs)),
                      ctypes.c_double(float(sub_periods)), int(n_sub),
                      _ptr(band_ap))
    return band_ap


def ola_add(out, ir, offset, gain=1.0):
    """In-place clipped scatter-add: out[offset:offset+len(ir)] += gain*ir."""
    lib = _load()
    assert out.dtype == np.float64 and out.flags.c_contiguous
    ir = np.ascontiguousarray(ir, dtype=np.float64)
    lib.ola_add(_ptr(out), len(out), _ptr(ir), len(ir),
                ctypes.c_int64(int(offset)), ctypes.c_double(float(gain)))


def dtw_path(x, y):
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    tx, ty = x.shape[0], y.shape[0]
    px = np.zeros(tx + ty, dtype=np.int32)
    py = np.zeros(tx + ty, dtype=np.int32)
    k = lib.dtw_path(_ptr(x), tx, _ptr(y), ty, x.shape[1],
                     px.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                     py.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return px[:k].astype(np.int64), py[:k].astype(np.int64)


def banded_cholesky_solve(ab, rhs, bandwidth):
    """Solve the banded SPD system given scipy upper-banded storage ``ab``;
    rhs (T, k) solved out-of-place."""
    lib = _load()
    ab = np.ascontiguousarray(ab, dtype=np.float64)
    out = np.ascontiguousarray(rhs, dtype=np.float64).copy()
    r = lib.banded_cholesky_solve(_ptr(ab), out.shape[0], int(bandwidth),
                                  _ptr(out), out.shape[1])
    if r != 0:
        raise np.linalg.LinAlgError("banded matrix not SPD")
    return out
