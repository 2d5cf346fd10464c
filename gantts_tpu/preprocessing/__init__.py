"""Host-side feature preprocessing (NumPy, float64 where it matters).

TPU-native re-provision of the pure-Python parts of ``nnmnkwii.preprocessing``
that the reference depends on (SURVEY.md section 2.3): normalization-stat
collection and application, trajectory smoothing, F0 interpolation and frame
utilities.  These run on the host in the offline front-end and in the data
pipeline; the device never sees them.

Reference call sites:
  scale/inv_scale           train.py:104-106, 358-396; evaluation_vc.py:61,88
  minmax/meanvar            train.py:725-751
  minmax_scale(_params)     train.py:116-124; evaluation_tts.py:157-159,211
  delta_features            re-exported from core.windows
  trim_zeros_frames         prepare_features_vc.py:49,105-106
  adjust_frame_lengths      prepare_features_vc.py:113-115
  modspec_smoothing         prepare_features_vc.py:56-58, evaluation_vc.py:53
  interp1d                  prepare_features_tts.py:136
"""

from __future__ import annotations

import numpy as np

from gantts_tpu.core.windows import delta_features  # noqa: F401 (re-export)
from gantts_tpu.preprocessing.alignment import DTWAligner  # noqa: F401


def _handle_zeros(scale):
    """Avoid div-by-zero for constant feature dims (sklearn convention)."""
    scale = np.asarray(scale, dtype=np.float64).copy()
    if scale.ndim == 0:
        return 1.0 if scale == 0.0 else scale
    scale[scale == 0.0] = 1.0
    return scale


def scale(x, data_mean, data_std):
    """Z-score normalization: (x - mean) / std  (std==0 dims pass through)."""
    return (x - data_mean) / _handle_zeros(data_std)


def inv_scale(x, data_mean, data_std):
    """Inverse of :func:`scale`: x * std + mean."""
    return data_std * x + data_mean


def minmax_scale_params(data_min, data_max, feature_range=(0, 1)):
    """Precompute (min_, scale_) for :func:`minmax_scale`."""
    data_range = data_max - data_min
    scale_ = (feature_range[1] - feature_range[0]) / _handle_zeros(data_range)
    return data_min, scale_


def minmax_scale(x, data_min=None, data_max=None, feature_range=(0, 1),
                 scale_=None, min_=None):
    """Min-max scaling into ``feature_range``.

    Either pass raw (data_min, data_max) or precomputed (min_, scale_) from
    :func:`minmax_scale_params` (the reference uses both forms:
    train.py:116-124 and evaluation_tts.py:157-159).
    """
    if scale_ is None or min_ is None:
        min_, scale_ = minmax_scale_params(data_min, data_max, feature_range)
    return (x - min_) * scale_ + feature_range[0]


def inv_minmax_scale(x, data_min=None, data_max=None, feature_range=(0, 1),
                     scale_=None, min_=None):
    """Inverse of :func:`minmax_scale`."""
    if scale_ is None or min_ is None:
        min_, scale_ = minmax_scale_params(data_min, data_max, feature_range)
    return (x - feature_range[0]) / scale_ + min_


def meanvar(dataset, lengths=None, mean_=0.0, var_=0.0,
            last_sample_count=0, return_last_sample_count=False):
    """Streaming per-dimension mean/variance over all frames of a dataset.

    Mirrors ``nnmnkwii.preprocessing.meanvar`` including the incremental
    pooling the reference uses to pool X and Y stats for VC
    (train.py:725-729): pass the previous call's (mean_, var_,
    last_sample_count) to continue accumulating.  Variance is the population
    variance (biased), as in the reference chain.
    """
    mean_ = np.asarray(mean_, dtype=np.float64)
    var_ = np.asarray(var_, dtype=np.float64)
    n = int(last_sample_count)
    # Chan et al. parallel update on (sum, sum of squared deviations).
    if n > 0:
        m2 = var_ * n
        total = mean_ * n
    else:
        m2 = None
        total = None

    for idx, x in enumerate(dataset):
        x = np.asarray(x, dtype=np.float64)
        if lengths is not None:
            x = x[: lengths[idx]]
        nb = x.shape[0]
        if nb == 0:
            continue
        mb = x.mean(axis=0)
        m2b = ((x - mb) ** 2).sum(axis=0)
        if total is None:
            total, m2, n = mb * nb, m2b, nb
        else:
            delta = mb - total / n
            total = total + mb * nb
            m2 = m2 + m2b + delta ** 2 * n * nb / (n + nb)
            n += nb

    mean_out = total / n
    var_out = m2 / n
    if return_last_sample_count:
        return mean_out, var_out, n
    return mean_out, var_out


def minmax(dataset, lengths=None):
    """Per-dimension min/max over all frames of a dataset (train.py:744)."""
    data_min, data_max = None, None
    for idx, x in enumerate(dataset):
        x = np.asarray(x)
        if lengths is not None:
            x = x[: lengths[idx]]
        xmin, xmax = x.min(axis=0), x.max(axis=0)
        if data_min is None:
            data_min, data_max = xmin, xmax
        else:
            data_min = np.minimum(data_min, xmin)
            data_max = np.maximum(data_max, xmax)
    return data_min.astype(np.float64), data_max.astype(np.float64)


def trim_zeros_frames(x, eps=1e-7):
    """Drop trailing frames whose L1 norm is < eps (prepare_features_vc.py:49)."""
    T = x.shape[0]
    s = np.abs(x).sum(axis=tuple(range(1, x.ndim)))
    keep = T
    while keep > 0 and s[keep - 1] < eps:
        keep -= 1
    return x[:keep]


def adjust_frame_length(x, pad=True, divisible_by=1):
    """Pad (with zeros) or truncate one array so T % divisible_by == 0."""
    T = x.shape[0]
    if divisible_by > 1:
        rem = T % divisible_by
        if rem:
            if pad:
                T = T + divisible_by - rem
            else:
                T = T - rem
    return _fix_length(x, T)


def adjust_frame_lengths(x, y, pad=True, ensure_even=False, divisible_by=1):
    """Make two arrays share a frame count (prepare_features_vc.py:113-115).

    If ``pad``, both are zero-padded up to the max length, else truncated to
    the min; then the common length is adjusted to ``divisible_by``.
    """
    if ensure_even:
        divisible_by = 2
    Tx, Ty = x.shape[0], y.shape[0]
    T = max(Tx, Ty) if pad else min(Tx, Ty)
    if divisible_by > 1:
        rem = T % divisible_by
        if rem:
            T = T + divisible_by - rem if pad else T - rem
    return _fix_length(x, T), _fix_length(y, T)


def _fix_length(x, T):
    if x.shape[0] == T:
        return x
    if x.shape[0] > T:
        return x[:T]
    pad_width = [(0, T - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad_width, mode="constant")


def modspec(y, n=4096, norm=None):
    """Modulation spectrum: power of the per-dimension temporal DFT."""
    s_complex = np.fft.rfft(y, n=n, axis=0, norm=norm)
    return s_complex.real ** 2 + s_complex.imag ** 2


def modspec_smoothing(y, modfs, n=4096, cutoff=50):
    """Trajectory smoothing by removing modulation frequencies above cutoff.

    Equivalent in behavior to ``nnmnkwii.preprocessing.modspec_smoothing``
    (reference: prepare_features_vc.py:56-58, evaluation_vc.py:53,
    prepare_features_tts.py:139-143): a brick-wall low-pass at ``cutoff`` Hz
    applied along the time axis of each feature dimension.  ``modfs`` is the
    frame rate (fs / hop_length, e.g. 200 Hz at 5 ms frames).
    """
    T = y.shape[0]
    if n < T:
        # choose next power of two >= T instead of failing
        n = 1 << (T - 1).bit_length()
    if cutoff >= modfs / 2:
        return y
    s = np.fft.rfft(y, n=n, axis=0)
    freqs = np.fft.rfftfreq(n, d=1.0 / modfs)
    s[freqs > cutoff] = 0.0
    out = np.fft.irfft(s, n=n, axis=0)[:T]
    return out.astype(y.dtype)


def interp1d(f0, kind="slinear"):
    """Fill unvoiced (zero) regions of an F0/lf0 trajectory by interpolation.

    Equivalent of ``nnmnkwii.preprocessing.interp1d``
    (prepare_features_tts.py:136).  ``f0`` is (T,) or (T, 1); zeros are
    treated as unvoiced and replaced by scipy interpolation over the voiced
    samples; leading/trailing unvoiced regions take the nearest voiced value.
    """
    import scipy.interpolate

    squeeze = f0.ndim == 2
    v = f0.reshape(-1).astype(np.float64)
    nz = np.nonzero(v)[0]
    if len(nz) == 0:
        return f0
    if len(nz) < 4 and kind in ("quadratic", "cubic"):
        kind = "slinear" if len(nz) >= 2 else "nearest"
    if len(nz) == 1:
        out = np.full_like(v, v[nz[0]])
    else:
        f = scipy.interpolate.interp1d(
            nz, v[nz], kind=kind, bounds_error=False,
            fill_value=(v[nz[0]], v[nz[-1]]))
        out = v.copy()
        zeros = np.where(v == 0)[0]
        out[zeros] = f(zeros)
    out = out.astype(f0.dtype)
    return out.reshape(f0.shape) if squeeze else out
