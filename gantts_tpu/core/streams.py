"""Multi-stream feature arithmetic (mgc / lf0 / vuv / bap stacking).

TPU-native equivalent of ``gantts/multistream.py`` (reference :15-79).  All
stream boundaries are static Python ints so every function traces to static
slices under ``jax.jit`` — no dynamic shapes reach XLA.

The canonical TTS-acoustic layout (hparams.py:196-197):
  stream_sizes          = [180, 3, 1, 3]   (mgc, lf0, vuv, bap; 3 windows)
  has_dynamic_features  = [True, True, False, True]
  static sizes          = [60, 1, 1, 1]
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def get_static_stream_sizes(stream_sizes, has_dynamic_features, num_windows):
    """Static dimension of each stream (gantts/multistream.py:46-53)."""
    static_stream_sizes = np.array(stream_sizes)
    static_stream_sizes[np.asarray(has_dynamic_features)] = \
        static_stream_sizes[np.asarray(has_dynamic_features)] // num_windows
    return static_stream_sizes


def select_streams(inputs, stream_sizes=(60, 1, 1, 1),
                   streams=(True, True, True, True)):
    """Concatenate the enabled streams (gantts/multistream.py:33-43).

    ``inputs`` is (..., T, D); returns (..., T, D_selected).
    """
    start_indices = np.hstack(([0], np.cumsum(stream_sizes)[:-1])).astype(int)
    ret = [
        inputs[..., start_idx:start_idx + size]
        for start_idx, size, enabled in zip(start_indices, stream_sizes, streams)
        if enabled
    ]
    return jnp.concatenate(ret, axis=-1)


def get_static_features(inputs, num_windows, stream_sizes=(180, 3, 1, 3),
                        has_dynamic_features=(True, True, False, True),
                        streams=(True, True, True, True)):
    """Extract static blocks from static+dynamic features
    (gantts/multistream.py:56-79)."""
    D = inputs.shape[-1]
    if stream_sizes is None or (len(stream_sizes) == 1 and has_dynamic_features[0]):
        return inputs[..., : D // num_windows]
    if len(stream_sizes) == 1 and not has_dynamic_features[0]:
        return inputs

    start_indices = np.hstack(([0], np.cumsum(stream_sizes)[:-1])).astype(int)
    ret = []
    for start_idx, size, v, enabled in zip(
            start_indices, stream_sizes, has_dynamic_features, streams):
        if not enabled:
            continue
        if v:
            ret.append(inputs[..., start_idx:start_idx + size // num_windows])
        else:
            ret.append(inputs[..., start_idx:start_idx + size])
    return jnp.concatenate(ret, axis=-1)


def recompute_delta_features(Y, windows,
                             stream_sizes=(180, 3, 1, 3),
                             has_dynamic_features=(True, True, False, True)):
    """Re-derive delta blocks from the static block of each dynamic stream.

    Host-side (NumPy) — used by the data pipeline after normalization, exactly
    where the reference calls it (train.py:129-132, gantts/multistream.py:15-30).
    The reference signature also takes (unused) mean/std; dropped here.
    ``Y`` is (T, D); modified copy is returned.
    """
    from gantts_tpu.core.windows import delta_features

    Y = np.array(Y, copy=True)
    start_indices = np.hstack(([0], np.cumsum(stream_sizes)[:-1])).astype(int)
    end_indices = np.cumsum(stream_sizes).astype(int)
    static_stream_sizes = get_static_stream_sizes(
        stream_sizes, has_dynamic_features, len(windows))

    for start_idx, end_idx, static_size, has_dynamic in zip(
            start_indices, end_indices, static_stream_sizes,
            has_dynamic_features):
        if has_dynamic:
            y_static = Y[:, start_idx:start_idx + static_size]
            Y[:, start_idx:end_idx] = delta_features(y_static, windows)
    return Y
