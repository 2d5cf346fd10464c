"""Core math acceptance suite.

Mirrors the reference's tests/test_gantts.py:60-163 (select_streams,
get_static_stream_sizes, get_static_features, multi_stream_mlpg) and adds the
MLPG exactness properties that substitute for golden comparison against
nnmnkwii (which synthesized its ground truth with the same library under
test; here we verify against the mathematical definition instead).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gantts_tpu.core import (
    build_win_mats,
    delta_features,
    get_static_features,
    get_static_stream_sizes,
    masked_mse_loss,
    mlpg,
    multi_stream_mlpg,
    recompute_delta_features,
    select_streams,
    sequence_mask,
    unit_variance_mlpg,
    unit_variance_mlpg_matrix,
)

WINDOWS3 = [
    (0, 0, np.array([1.0])),
    (1, 1, np.array([-0.5, 0.0, 0.5])),
    (1, 1, np.array([1.0, -2.0, 1.0])),
]
WINDOWS2 = WINDOWS3[:2]


def test_build_win_mats_boundaries():
    W = build_win_mats(WINDOWS3, 5)
    # identity window
    assert np.allclose(W[0], np.eye(5))
    # delta window: row 1 = [-0.5, 0, 0.5, 0, 0]; row 0 clipped: [0, 0.5, ...]
    assert np.allclose(W[1][1], [-0.5, 0, 0.5, 0, 0])
    assert np.allclose(W[1][0], [0, 0.5, 0, 0, 0])
    assert np.allclose(W[1][4], [0, 0, 0, -0.5, 0])
    # delta-delta row 2 = [0, 1, -2, 1, 0]
    assert np.allclose(W[2][2], [0, 1, -2, 1, 0])


def test_delta_features_matches_win_mats():
    rng = np.random.RandomState(0)
    x = rng.randn(13, 4)
    W = build_win_mats(WINDOWS3, 13)
    feats = delta_features(x, WINDOWS3)
    for k in range(3):
        assert np.allclose(feats[:, 4 * k: 4 * (k + 1)], W[k] @ x, atol=1e-10)


def test_unit_variance_mlpg_matrix_definition():
    """R must equal (sum W^T W)^{-1} [W_0;W_1;W_2]^T computed densely."""
    T = 17
    R = unit_variance_mlpg_matrix(WINDOWS3, T, dtype=np.float64)
    W = build_win_mats(WINDOWS3, T)
    P = sum(w.T @ w for w in W)
    Wstack = np.vstack(W)  # (3T, T)
    R_dense = np.linalg.solve(P, Wstack.T)
    assert np.allclose(R, R_dense, atol=1e-8)


def test_unit_variance_mlpg_exact_recovery():
    """MLPG of exactly-consistent static+delta features recovers the statics."""
    rng = np.random.RandomState(42)
    T, S = 40, 6
    s = rng.randn(T, S)
    u = delta_features(s, WINDOWS3)  # (T, 3S)
    R = unit_variance_mlpg_matrix(WINDOWS3, T)
    out = unit_variance_mlpg(jnp.asarray(R), jnp.asarray(u, dtype=jnp.float32))
    assert out.shape == (T, S)
    assert np.allclose(np.asarray(out), s, atol=1e-3)

    # batched
    batch = jnp.stack([jnp.asarray(u, dtype=jnp.float32)] * 3)
    outb = unit_variance_mlpg(jnp.asarray(R), batch)
    assert outb.shape == (3, T, S)
    assert np.allclose(np.asarray(outb[1]), s, atol=1e-3)


def test_unit_variance_mlpg_differentiable():
    T, S = 12, 2
    R = jnp.asarray(unit_variance_mlpg_matrix(WINDOWS2, T))

    def loss(u):
        return jnp.sum(unit_variance_mlpg(R, u) ** 2)

    u = jnp.ones((T, 2 * S))
    g = jax.grad(loss)(u)
    assert g.shape == u.shape
    assert np.isfinite(np.asarray(g)).all()


def test_full_mlpg_variances():
    """Full-variance MLPG equals the dense weighted-LS solution."""
    rng = np.random.RandomState(1)
    T, D = 25, 3
    means = rng.randn(T, 3 * D)
    var = rng.rand(3 * D) + 0.1
    out = mlpg(means, var, WINDOWS3)
    assert out.shape == (T, D)

    W = build_win_mats(WINDOWS3, T)
    Wstack = np.vstack(W)  # (3T, T)
    for d in range(D):
        u = np.concatenate([means[:, k * D + d] for k in range(3)])
        iv = np.concatenate([np.full(T, 1.0 / var[k * D + d]) for k in range(3)])
        P = Wstack.T @ (iv[:, None] * Wstack)
        b = Wstack.T @ (iv * u)
        y = np.linalg.solve(P, b)
        assert np.allclose(out[:, d], y, atol=1e-8)

    # unit variances -> must agree with R @ means (training-time path)
    R = unit_variance_mlpg_matrix(WINDOWS3, T, dtype=np.float64)
    out_unit = mlpg(means, np.ones(3 * D), WINDOWS3)
    ref = np.asarray(unit_variance_mlpg(jnp.asarray(R), jnp.asarray(means)))
    assert np.allclose(out_unit, ref, atol=1e-6)


# --- reference test parity (tests/test_gantts.py:60-163) ------------------

def test_select_streams():
    static_stream_sizes = [60, 1, 1, 1]
    x = jnp.zeros((32, 100, 63))
    assert select_streams(x, static_stream_sizes,
                          streams=[True, True, True, True]).shape == (32, 100, 63)
    assert select_streams(x, static_stream_sizes,
                          streams=[True, False, False, False]).shape == (32, 100, 60)
    assert select_streams(x, static_stream_sizes,
                          streams=[True, False, False, True]).shape == (32, 100, 61)

    x = jnp.broadcast_to(jnp.arange(0, 63, dtype=jnp.float32), (32, 100, 63))
    assert (select_streams(x, static_stream_sizes,
                           streams=[False, False, False, True])[..., 0] == x[:, :, -1]).all()
    assert (select_streams(x, static_stream_sizes,
                           streams=[False, False, True, False])[..., 0] == x[:, :, -2]).all()
    assert (select_streams(x, static_stream_sizes,
                           streams=[False, True, False, False])[..., 0] == x[:, :, -3]).all()

    y = select_streams(x, static_stream_sizes, streams=[True, False, False, True])
    assert (y[:, :, :60] == x[:, :, :60]).all()
    assert (y[:, :, -1] == x[:, :, -1]).all()

    y = select_streams(x, static_stream_sizes, streams=[True, True, False, False])
    assert (y[:, :, :60] == x[:, :, :60]).all()
    assert (y[:, :, 60] == x[:, :, 60]).all()


def test_get_static_stream_sizes():
    stream_sizes = [180, 3, 1, 3]
    has_dynamic_features = [True, True, False, True]
    sizes = get_static_stream_sizes(stream_sizes, has_dynamic_features, 3)
    assert np.all(sizes == [60, 1, 1, 1])


def test_get_static_features():
    T, B, in_dim = 100, 32, 187
    x = jnp.asarray(np.random.RandomState(0).rand(B, T, in_dim), jnp.float32)
    stream_sizes = [180, 3, 1, 3]
    has_dynamic_features = [True, True, False, True]
    assert get_static_features(
        x, 3, stream_sizes, has_dynamic_features).shape == (B, T, 63)
    assert get_static_features(
        x, 3, stream_sizes, has_dynamic_features,
        streams=[True, False, False, False]).shape == (B, T, 60)
    assert get_static_features(
        x, 3, stream_sizes, has_dynamic_features,
        streams=[False, True, False, False]).shape == (B, T, 1)
    assert get_static_features(
        x, 3, stream_sizes, has_dynamic_features,
        streams=[True, False, False, True]).shape == (B, T, 61)
    # single-stream dynamic (the VC layout)
    xs = x[..., :177]
    assert get_static_features(xs, 3, [177], [True]).shape == (B, T, 59)


def test_multi_stream_mlpg():
    T, B, in_dim = 100, 32, 187
    R = jnp.asarray(unit_variance_mlpg_matrix(WINDOWS3, T))
    x = jnp.asarray(np.random.RandomState(0).rand(B, T, in_dim), jnp.float32)
    stream_sizes = [180, 3, 1, 3]
    has_dynamic_features = [True, True, False, True]
    y = multi_stream_mlpg(x, R, stream_sizes, has_dynamic_features)
    assert y.shape == (B, T, 63)

    mgc = y[:, :, :60]
    lf0 = y[:, :, 60]
    vuv = y[:, :, 61]
    bap = y[:, :, 62]

    assert np.allclose(unit_variance_mlpg(R, x[:, :, :180]), mgc)
    assert np.allclose(unit_variance_mlpg(R, x[:, :, 180:183])[..., 0], lf0)
    assert np.allclose(x[:, :, 183], vuv)
    assert np.allclose(unit_variance_mlpg(R, x[:, :, 184:187])[..., 0], bap)

    statics = get_static_features(x, 3, stream_sizes, has_dynamic_features)
    assert statics.shape == y.shape

    with pytest.raises(RuntimeError):
        multi_stream_mlpg(x, R, [100, 3, 1, 3], has_dynamic_features)


def test_recompute_delta_features():
    rng = np.random.RandomState(3)
    T = 50
    Y = rng.randn(T, 187).astype(np.float32)
    out = recompute_delta_features(Y, WINDOWS3, [180, 3, 1, 3],
                                   [True, True, False, True])
    # static blocks and vuv unchanged
    assert np.allclose(out[:, :60], Y[:, :60])
    assert np.allclose(out[:, 183], Y[:, 183])
    # delta blocks re-derived from statics
    assert np.allclose(out[:, 60:120], delta_features(Y[:, :60], WINDOWS3)[:, 60:120])
    # idempotent
    again = recompute_delta_features(out, WINDOWS3, [180, 3, 1, 3],
                                     [True, True, False, True])
    assert np.allclose(again, out, atol=1e-5)


def test_sequence_mask_and_masked_mse():
    lengths = jnp.array([3, 5, 1])
    mask = sequence_mask(lengths, 6)
    assert mask.shape == (3, 6)
    assert np.allclose(np.asarray(mask).sum(axis=1), [3, 5, 1])

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(3, 6, 4), jnp.float32)
    b = jnp.asarray(rng.randn(3, 6, 4), jnp.float32)
    loss = masked_mse_loss(a, b, lengths=lengths)
    # manual
    m = np.asarray(mask)[..., None]
    manual = ((np.asarray(a) - np.asarray(b)) ** 2 * m).sum() / m.sum()
    assert np.allclose(float(loss), manual, rtol=1e-5)

    # padding must not contribute
    a2 = a.at[0, 3:].set(1e6)
    assert np.allclose(float(masked_mse_loss(a2, b, lengths=lengths)),
                       manual, rtol=1e-5)

    with pytest.raises(RuntimeError):
        masked_mse_loss(a, b)
