"""Pallas kernel tests (interpret mode on CPU; real on TPU).

The associative-scan formulation in models/sru.py is the numerical oracle
for both the forward values and the gradients of the Pallas scan."""

import numpy as np

import jax
import jax.numpy as jnp

from gantts_tpu.kernels import linear_recurrence_pallas
from gantts_tpu.models.sru import linear_recurrence


def _rand(shape, seed):
    return jnp.asarray(
        np.random.RandomState(seed).rand(*shape).astype(np.float32))


def test_pallas_scan_matches_oracle():
    B, T, H = 3, 40, 20  # deliberately unaligned -> exercises padding
    f = _rand((B, T, H), 0) * 0.9 + 0.05
    b = _rand((B, T, H), 1) - 0.5
    c_pallas = linear_recurrence_pallas(f, b)
    c_ref = linear_recurrence(f, b)
    assert c_pallas.shape == (B, T, H)
    assert np.allclose(np.asarray(c_pallas), np.asarray(c_ref), atol=1e-5)


def test_pallas_scan_gradients_match_oracle():
    B, T, H = 2, 16, 8
    f = _rand((B, T, H), 2) * 0.9 + 0.05
    b = _rand((B, T, H), 3) - 0.5
    w = _rand((B, T, H), 4)

    def loss_pallas(f, b):
        return jnp.sum(linear_recurrence_pallas(f, b) * w)

    def loss_ref(f, b):
        return jnp.sum(linear_recurrence(f, b) * w)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(f, b)
    gr = jax.grad(loss_ref, argnums=(0, 1))(f, b)
    for a, c in zip(gp, gr):
        assert np.allclose(np.asarray(a), np.asarray(c), atol=1e-4), \
            np.abs(np.asarray(a) - np.asarray(c)).max()


def test_pallas_scan_jit_and_vmapless_batch():
    B, T, H = 8, 64, 128  # tile-aligned path
    f = _rand((B, T, H), 5) * 0.5
    b = _rand((B, T, H), 6)
    out = jax.jit(linear_recurrence_pallas)(f, b)
    ref = linear_recurrence(f, b)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
