"""Stencil MLPG must be numerically interchangeable with the dense path."""

import numpy as np
import pytest

import jax.numpy as jnp

from gantts_tpu.core import unit_variance_mlpg, unit_variance_mlpg_matrix
from gantts_tpu.core.fast_mlpg import (
    multi_stream_mlpg_stencil,
    unit_variance_mlpg_stencil,
)
from gantts_tpu.core.paramgen import multi_stream_mlpg

WINDOWS3 = [
    (0, 0, np.array([1.0])),
    (1, 1, np.array([-0.5, 0.0, 0.5])),
    (1, 1, np.array([1.0, -2.0, 1.0])),
]


@pytest.mark.parametrize("T", [104, 331])
def test_stencil_matches_dense(T):
    rng = np.random.RandomState(0)
    B, S = 3, 7
    u = jnp.asarray(rng.randn(B, T, 3 * S).astype(np.float32))
    R = jnp.asarray(unit_variance_mlpg_matrix(WINDOWS3, T))
    dense = np.asarray(unit_variance_mlpg(R, u))
    fast = np.asarray(unit_variance_mlpg_stencil(u, WINDOWS3))
    err = np.abs(dense - fast).max()
    assert err < 2e-5, f"T={T}: stencil vs dense max err {err}"


def test_stencil_multi_stream():
    rng = np.random.RandomState(1)
    B, T = 2, 200
    x = jnp.asarray(rng.randn(B, T, 187).astype(np.float32))
    R = jnp.asarray(unit_variance_mlpg_matrix(WINDOWS3, T))
    dense = np.asarray(multi_stream_mlpg(
        x, R, (180, 3, 1, 3), (True, True, False, True)))
    fast = np.asarray(multi_stream_mlpg_stencil(
        x, WINDOWS3, (180, 3, 1, 3), (True, True, False, True)))
    assert fast.shape == dense.shape
    assert np.abs(dense - fast).max() < 2e-5


def test_stencil_rejects_short():
    u = jnp.zeros((1, 50, 9))
    with pytest.raises(ValueError):
        unit_variance_mlpg_stencil(u, WINDOWS3)
