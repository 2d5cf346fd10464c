"""Window matrices and MLPG parameter-generation math (host-side, NumPy).

This module is the TPU-native replacement for the banded-matrix machinery the
reference pulls in through ``nnmnkwii.paramgen`` / ``bandmat`` (Cython):

- ``unit_variance_mlpg_matrix`` (reference use: train.py:509-515,
  evaluation_vc.py:70, tests/test_gantts.py:31) — the dense T x (K*T) matrix
  ``R`` that turns a *normalized* static+dynamic trajectory into the maximum-
  likelihood static trajectory, assuming unit variances.
- ``mlpg`` (reference use: evaluation_tts.py:72-74, 96-98) — full MLPG with
  per-dimension variances, solved as a banded symmetric positive-definite
  system (O(T * b^2) instead of O(T^3)).
- ``delta_features`` (reference use: prepare_features_vc.py:60,
  prepare_features_tts.py:145-147; nnmnkwii.preprocessing.delta_features) —
  window application on a static trajectory.

Math
----
A "window" is a tuple ``(l, u, coeffs)`` with ``len(coeffs) == l + u + 1``.
Its T x T matrix W has ``W[t, t + k] = coeffs[l + k]`` for ``-l <= k <= u``
(entries falling outside the matrix are dropped — boundary frames see a
*clipped* window, which is the bandmat ``band_c`` convention the reference
inherits).

Given K windows, the stacked window matrix is the (K*T) x T block column
``W* = [W_0; W_1; ...; W_{K-1}]``.  MLPG solves, per feature dimension d,

    y*_d = argmin_y || Sigma_d^{-1/2} (W* y - u_d) ||^2
         = (W*^T Sigma_d^{-1} W*)^{-1} W*^T Sigma_d^{-1} u_d

where ``u_d`` is the mean trajectory for dimension d laid out window-major
(all frames of window 0, then window 1, ...).  With unit variances the
solution is a single matrix ``R = P^{-1} W*^T`` (P = sum_k W_k^T W_k) shared
by every dimension — MLPG becomes one matmul, which is why the training-time
hot path on TPU is a single MXU-friendly ``R @ means`` (see core/mlpg.py).

P is symmetric positive definite and *banded* with half-bandwidth
``b = max_k(l_k + u_k)``; we build and factor it in banded storage
(scipy ``cholesky_banded``), never materializing a T x T dense P.

Exactness property used by the test-suite: if ``u = delta_features(s, windows)``
for any static trajectory ``s`` then ``R @ window_major(u) == s`` exactly
(up to float tolerance), since P^{-1} W*^T W* = I.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg

# The three delta windows used throughout the reference (hparams.py:22-27).
DEFAULT_WINDOWS = [
    (0, 0, np.array([1.0])),
    (1, 1, np.array([-0.5, 0.0, 0.5])),
    (1, 1, np.array([1.0, -2.0, 1.0])),
]


def _check_window(window):
    l, u, coeffs = window
    coeffs = np.asarray(coeffs, dtype=np.float64)
    if l < 0 or u < 0 or len(coeffs) != l + u + 1:
        raise ValueError(f"Malformed window {window!r}: need len(coeffs) == l + u + 1")
    return int(l), int(u), coeffs


def build_win_mats(windows, T):
    """Dense T x T matrix for each window (clipped at the boundaries)."""
    mats = []
    for window in windows:
        l, u, coeffs = _check_window(window)
        W = np.zeros((T, T), dtype=np.float64)
        for k in range(-l, u + 1):
            c = coeffs[l + k]
            if c == 0.0:
                continue
            idx = np.arange(max(0, -k), min(T, T - k))
            W[idx, idx + k] = c
        mats.append(W)
    return mats


def window_half_bandwidth(windows) -> int:
    """Half-bandwidth of P = sum_k W_k^T W_k."""
    b = 0
    for window in windows:
        l, u, _ = _check_window(window)
        b = max(b, l + u)
    return b


def _banded_precision(windows, T):
    """P = sum_k W_k^T W_k in scipy upper-banded storage, shape (b+1, T).

    ``ab[b + i - j, j] = P[i, j]`` for ``max(0, j-b) <= i <= j``.
    Built directly from the window coefficients (no dense T x T temporaries):
    P[i, j] = sum_k sum_t W_k[t, i] W_k[t, j], where W_k[t, i] = c_k[i - t + l]
    restricted to valid offsets.
    """
    b = window_half_bandwidth(windows)
    ab = np.zeros((b + 1, T), dtype=np.float64)
    for window in windows:
        l, u, coeffs = _check_window(window)
        # W[t, t+k] = coeffs[l+k]; contribution to P[t+k1, t+k2] is
        # coeffs[l+k1]*coeffs[l+k2] for every valid row t.
        for k1 in range(-l, u + 1):
            c1 = coeffs[l + k1]
            if c1 == 0.0:
                continue
            for k2 in range(k1, u + 1):  # j >= i (upper triangle)
                c2 = coeffs[l + k2]
                if c2 == 0.0:
                    continue
                # rows t where both columns are in range
                t0 = max(0, -k1, -k2)
                t1 = min(T, T - k1, T - k2)
                if t1 <= t0:
                    continue
                i = np.arange(t0, t1) + k1
                j = np.arange(t0, t1) + k2
                ab[b + i - j, j] += c1 * c2
    return ab


def unit_variance_mlpg_matrix(windows, T, dtype=np.float32):
    """R = (sum_k W_k^T W_k)^{-1} [W_0; ...; W_{K-1}]^T, shape (T, K*T).

    TPU-native equivalent of ``nnmnkwii.paramgen.unit_variance_mlpg_matrix``
    (reference: train.py:511, evaluation_vc.py:70).  The banded SPD system is
    factored once (O(T b^2)) and solved against the K*T stacked window rows.

    The result is meant to be computed once per bucketed sequence length and
    cached (the reference rebuilds it per batch on the host — train.py:509-512
    — which the TPU build deliberately avoids; see train/loop.py).
    """
    K = len(windows)
    ab = _banded_precision(windows, T)
    # RHS: W*^T laid out as (T, K*T): column (k*T + t) is row t of W_k.
    rhs = np.zeros((T, K * T), dtype=np.float64)
    for k, window in enumerate(windows):
        l, u, coeffs = _check_window(window)
        for off in range(-l, u + 1):
            c = coeffs[l + off]
            if c == 0.0:
                continue
            t = np.arange(max(0, -off), min(T, T - off))
            # W_k[t, t+off] = c  ->  (W_k^T)[t+off, t] = c
            rhs[t + off, k * T + t] = c
    R = _solveh_banded(ab, rhs)
    return np.ascontiguousarray(R, dtype=dtype)


def _solveh_banded(ab, rhs):
    """Banded SPD solve; C++ production path (cpp/frontend.cpp
    banded_cholesky_solve), scipy fallback."""
    from gantts_tpu.frontend import native

    if native.available():
        return native.banded_cholesky_solve(
            ab, np.ascontiguousarray(rhs, np.float64),
            bandwidth=ab.shape[0] - 1)
    return scipy.linalg.solveh_banded(ab, rhs, lower=False)


def mlpg(means, variances, windows):
    """Full MLPG with per-dimension (frame-invariant) variances.

    TPU-native equivalent of ``nnmnkwii.paramgen.mlpg`` as exercised by the
    reference at evaluation_tts.py:72-74 (unit variances) and :96-98 (true
    variances).  ``means`` is (T, K*D) with per-frame layout
    ``[win0-block, win1-block, ..., win{K-1}-block]`` (each block D wide);
    ``variances`` is (K*D,) or (T, K*D) (only frame-invariant supported, which
    is all the reference uses).  Returns the (T, D) static trajectory.

    Solved per dimension as the banded SPD system
    ``(W*^T S^-1 W*) y = W*^T S^-1 u`` — O(T b^2 D), float64.
    """
    means = np.asarray(means, dtype=np.float64)
    T, KD = means.shape
    K = len(windows)
    if KD % K:
        raise ValueError(f"means dim {KD} not divisible by num windows {K}")
    D = KD // K
    variances = np.asarray(variances, dtype=np.float64)
    if variances.ndim == 2:
        # frame-variant not supported; reference only passes frame-invariant
        variances = variances[0]
    if variances.shape[-1] != KD:
        raise ValueError("variances must have K*D entries")

    b = window_half_bandwidth(windows)
    out = np.empty((T, D), dtype=np.float64)

    # Precompute per-window banded pieces; precision differs per dimension
    # only through the scalar 1/sigma^2_kd weights, so assemble per dim.
    win_info = [(_check_window(w)) for w in windows]

    for d in range(D):
        ab = np.zeros((b + 1, T), dtype=np.float64)
        rhs = np.zeros(T, dtype=np.float64)
        for k, (l, u, coeffs) in enumerate(win_info):
            inv_var = 1.0 / variances[k * D + d]
            u_kd = means[:, k * D + d]
            for k1 in range(-l, u + 1):
                c1 = coeffs[l + k1]
                if c1 == 0.0:
                    continue
                # rhs: (W_k^T S^-1 u)[t+k1] += c1 * inv_var * u_kd[t]
                t0, t1 = max(0, -k1), min(T, T - k1)
                rhs[np.arange(t0, t1) + k1] += c1 * inv_var * u_kd[t0:t1]
                for k2 in range(k1, u + 1):
                    c2 = coeffs[l + k2]
                    if c2 == 0.0:
                        continue
                    s0 = max(0, -k1, -k2)
                    s1 = min(T, T - k1, T - k2)
                    if s1 <= s0:
                        continue
                    i = np.arange(s0, s1) + k1
                    j = np.arange(s0, s1) + k2
                    ab[b + i - j, j] += c1 * c2 * inv_var
        out[:, d] = _solveh_banded(ab, rhs[:, None])[:, 0]
    return out


def delta_features(x, windows):
    """Apply each window to a static trajectory and concatenate.

    Equivalent of ``nnmnkwii.preprocessing.delta_features`` (reference use:
    prepare_features_vc.py:60, prepare_features_tts.py:145-147,
    gantts/multistream.py:28).  ``x`` is (T, D); returns (T, K*D) with
    per-frame layout [win0, win1, ...] — the layout MLPG expects.
    Boundary frames use clipped windows (out-of-range taps contribute 0).
    """
    x = np.asarray(x)
    T, D = x.shape
    outs = []
    for window in windows:
        l, u, coeffs = _check_window(window)
        y = np.zeros((T, D), dtype=x.dtype)
        for k in range(-l, u + 1):
            c = coeffs[l + k]
            if c == 0.0:
                continue
            t0, t1 = max(0, -k), min(T, T - k)
            y[t0:t1] += np.asarray(c * x[t0 + k:t1 + k], dtype=x.dtype)
        outs.append(y)
    return np.hstack(outs)
