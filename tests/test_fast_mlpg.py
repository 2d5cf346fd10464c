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


def test_dynamic_stencil_matches_exact_per_length():
    """One compiled stencil program must reproduce exact dense-R MLPG for
    multiple true lengths inside one padded buffer."""
    import jax

    from gantts_tpu.core.fast_mlpg import MLPGStencil
    from gantts_tpu.core.paramgen import unit_variance_mlpg as uvm

    rng = np.random.RandomState(0)
    S, Tp = 5, 256
    op = MLPGStencil.create(WINDOWS3)
    fn = jax.jit(lambda u, l: uvm(op, u, lengths=l))
    for T in (104, 163, 256):
        u = np.zeros((1, Tp, 3 * S), np.float32)
        u[0, :T] = rng.randn(T, 3 * S)
        y_dyn = np.asarray(fn(jnp.asarray(u), jnp.asarray([T])))[0, :T]
        R = jnp.asarray(unit_variance_mlpg_matrix(WINDOWS3, T))
        y_exact = np.asarray(uvm(R, jnp.asarray(u[0, :T])))
        err = np.abs(y_dyn - y_exact).max()
        assert err < 2e-5, f"T={T}: dynamic stencil err {err}"
        # padding must be zeroed
        if T < Tp:
            pad = np.asarray(fn(jnp.asarray(u), jnp.asarray([T])))[0, T:]
            assert np.abs(pad).max() == 0


def test_in2out_eval_uses_one_compile_for_all_lengths():
    """JittedForward with an In2Out model must not recompile per length."""
    import jax

    from gantts_tpu import hparams
    from gantts_tpu.models import create_model
    from gantts_tpu.synthesis import JittedForward

    hp = hparams.vc.copy()
    hp.order = 5
    hp.stream_sizes = [15]
    hp.generator_params.update(in_dim=15, out_dim=15, static_dim=5,
                               num_hidden=1, hidden_dim=8)
    model = create_model(hp.generator, **hp.generator_params)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 104, 15), np.float32),
                           jnp.asarray(unit_variance_mlpg_matrix(
                               WINDOWS3, 104)))
    fwd = JittedForward(model, variables, hp, needs_R=True)
    outs = {}
    for T in (104, 131, 160):  # all pad to the same bucket (160)
        x = np.random.RandomState(T).randn(T, 15).astype(np.float32)
        _, y = fwd(x)
        outs[T] = y
        assert y.shape == (T, 5)
    # exactness vs dense-R direct application at true length
    for T, y in outs.items():
        x = np.random.RandomState(T).randn(T, 15).astype(np.float32)
        R = jnp.asarray(unit_variance_mlpg_matrix(WINDOWS3, T))
        _, y_exact = model.apply(variables, x[None], R,
                                 jnp.asarray([T]))
        assert np.abs(y - np.asarray(y_exact)[0]).max() < 2e-5, T
