"""Model zoo tests — mirrors reference tests/test_gantts.py:17-57 plus
masking/bidirectionality/scan-equivalence checks specific to the TPU build."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gantts_tpu.core import unit_variance_mlpg_matrix, masked_mse_loss
from gantts_tpu.models import (
    MODEL_REGISTRY,
    create_model,
    include_parameter_generation,
)
from gantts_tpu.models.sru import linear_recurrence

WINDOWS2 = [
    (0, 0, np.array([1.0])),
    (1, 1, np.array([-0.5, 0.0, 0.5])),
]


def test_in2out_highway_forward_and_grad():
    """Reference test_model parity (tests/test_gantts.py:17-57)."""
    model = create_model("In2OutHighwayNet")
    assert include_parameter_generation(model)

    in_dim, T = 118, 100
    static_dim = in_dim // 2
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (1, T, in_dim))
    R = jnp.asarray(unit_variance_mlpg_matrix(WINDOWS2, T))
    variables = model.init(rng, x, R)
    x_out, y = model.apply(variables, x, R)
    assert y.shape == (1, T, static_dim)
    # Reference quirk (models.py:63-69): the first return is the pre-MLPG
    # last_linear trunk output, not the input.
    assert x_out.shape == (1, T, in_dim)
    assert not np.allclose(np.asarray(x_out), np.asarray(x))

    # mini-batch + masked loss gradient smoke test
    B = 8
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, in_dim))
    y_tgt = jax.random.uniform(jax.random.PRNGKey(2), (B, T, static_dim))
    lengths = jnp.array([50, 60, 70, 80, 90, 95, 99, 100])

    def loss_fn(params):
        _, y_hat = model.apply(params, x, R, lengths)
        return masked_mse_loss(y_hat, y_tgt, lengths=lengths)

    g = jax.grad(loss_fn)(variables)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in flat)
    assert any(float(jnp.abs(l).sum()) > 0 for l in flat)


@pytest.mark.parametrize("name", ["MLP", "SRURNN", "GRURNN", "LSTMRNN"])
def test_generic_models_shapes(name):
    model = create_model(name, in_dim=20, out_dim=7, num_hidden=2,
                         hidden_dim=16, last_sigmoid=False)
    assert not include_parameter_generation(model)
    x = jax.random.uniform(jax.random.PRNGKey(0), (3, 40, 20))
    lengths = jnp.array([40, 25, 10])
    variables = model.init(jax.random.PRNGKey(1), x, lengths)
    y = model.apply(variables, x, lengths)
    assert y.shape == (3, 40, 7)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.parametrize("name", ["SRURNN", "GRURNN", "LSTMRNN"])
@pytest.mark.parametrize("bidirectional", [False, True])
def test_rnn_padding_invariance(name, bidirectional):
    """Garbage in the padded region must not change valid-frame outputs."""
    model = create_model(name, in_dim=6, out_dim=4, num_hidden=2,
                         hidden_dim=8, bidirectional=bidirectional,
                         last_sigmoid=False)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 30, 6))
    lengths = jnp.array([20, 30])
    variables = model.init(jax.random.PRNGKey(1), x, lengths)
    y1 = model.apply(variables, x, lengths)
    x2 = x.at[0, 20:].set(1e3)  # poison the padding
    y2 = model.apply(variables, x2, lengths)
    assert np.allclose(np.asarray(y1[0, :20]), np.asarray(y2[0, :20]),
                       atol=1e-4), "padding leaked into valid frames"
    assert np.allclose(np.asarray(y1[1]), np.asarray(y2[1]), atol=1e-4)


def test_bidirectional_uses_future():
    """Backward direction must actually propagate future info to frame 0."""
    model = create_model("LSTMRNN", in_dim=4, out_dim=2, num_hidden=1,
                         hidden_dim=8, bidirectional=True, last_sigmoid=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4))
    lengths = jnp.array([4])
    variables = model.init(jax.random.PRNGKey(1), x, lengths)
    y1 = model.apply(variables, x, lengths)
    x2 = x.at[0, 3].add(10.0)  # change only the LAST frame
    y2 = model.apply(variables, x2, lengths)
    assert np.abs(np.asarray(y1[0, 0]) - np.asarray(y2[0, 0])).max() > 1e-4


def test_linear_recurrence_matches_sequential():
    """associative_scan formulation == sequential definition of the SRU cell."""
    rng = np.random.RandomState(0)
    B, T, H = 3, 50, 5
    f = 1 / (1 + np.exp(-rng.randn(B, T, H)))
    b = rng.randn(B, T, H)
    c_par = np.asarray(linear_recurrence(jnp.asarray(f), jnp.asarray(b)))
    c_seq = np.zeros((B, T, H))
    c = np.zeros((B, H))
    for t in range(T):
        c = f[:, t] * c + b[:, t]
        c_seq[:, t] = c
    assert np.allclose(c_par, c_seq, atol=1e-5)


def test_mlp_sigmoid_and_dropout_rng():
    model = create_model("MLP", in_dim=10, out_dim=1, num_hidden=2,
                         hidden_dim=16, dropout=0.5, last_sigmoid=True)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 5, 10))
    variables = model.init(jax.random.PRNGKey(1), x)
    y = model.apply(variables, x)
    assert ((np.asarray(y) >= 0) & (np.asarray(y) <= 1)).all()
    # stochastic under train mode with a dropout rng
    y1 = model.apply(variables, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    y2 = model.apply(variables, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_registry_surface():
    assert set(MODEL_REGISTRY) == {
        "In2OutHighwayNet", "In2OutRNNHighwayNet", "MLP",
        "SRURNN", "GRURNN", "LSTMRNN"}
    with pytest.raises(ValueError):
        create_model("NoSuchModel")
    # hparams-driven reflective construction (train.py:773-774 semantics)
    from gantts_tpu import hparams
    hp = hparams.vc.copy()
    hp.generator_params["in_dim"] = 177
    hp.generator_params["out_dim"] = 177
    g = create_model(hp.generator, **hp.generator_params)
    d = create_model(hp.discriminator, **hp.discriminator_params)
    assert include_parameter_generation(g)
    assert not include_parameter_generation(d)


def test_in2out_rnn_highway():
    model = create_model("In2OutRNNHighwayNet", in_dim=12, out_dim=12,
                         static_dim=6, num_hidden=2, hidden_dim=16,
                         bidirectional=True)
    T = 20
    R = jnp.asarray(unit_variance_mlpg_matrix(WINDOWS2, T))
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, T, 12))
    lengths = jnp.array([15, 20])
    variables = model.init(jax.random.PRNGKey(1), x, R, lengths)
    x_out, y = model.apply(variables, x, R, lengths)
    assert y.shape == (2, T, 6)
    # RNN variant preserves the OTHER reference quirk (models.py:94-118):
    # the first return is the untouched input, so its MSE term is inert.
    assert np.allclose(np.asarray(x_out), np.asarray(x))


def test_in2out_highway_first_return_is_trunk_output():
    """mse_w>0 semantics (reference models.py:63-69): the MLP In2Out variant
    returns the last_linear trunk output as y_hat; recompute it by hand from
    the extracted params and check exact agreement."""
    model = create_model("In2OutHighwayNet", in_dim=10, out_dim=10,
                         static_dim=5, num_hidden=2, hidden_dim=8)
    T = 16
    R = jnp.asarray(unit_variance_mlpg_matrix(WINDOWS2, T))
    x = jax.random.uniform(jax.random.PRNGKey(0), (3, T, 10))
    variables = model.init(jax.random.PRNGKey(1), x, R)
    x_out, _ = model.apply(variables, x, R)

    from gantts_tpu.models.common import leaky_relu
    p = variables["params"]
    h = x
    for i in range(2):
        li = p[f"H_{i}"]
        h = leaky_relu(h @ li["kernel"] + li["bias"])
    ll = p["last_linear"]
    h = h @ ll["kernel"] + ll["bias"]
    assert np.allclose(np.asarray(x_out), np.asarray(h), atol=1e-6)


def test_in2out_mse_term_gradient_semantics():
    """With mse_w>0 the MLP variant's MSE term must train the trunk, while
    the RNN variant's MSE term must be inert (zero gradient)."""
    T = 16
    R = jnp.asarray(unit_variance_mlpg_matrix(WINDOWS2, T))
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, T, 10))
    y_tgt = jax.random.uniform(jax.random.PRNGKey(1), (2, T, 10))
    lengths = jnp.array([12, 16])

    def mse_grad_norm(name, **kw):
        model = create_model(name, in_dim=10, out_dim=10, static_dim=5,
                             num_hidden=1, hidden_dim=8, **kw)
        variables = model.init(jax.random.PRNGKey(2), x, R, lengths)

        def loss(params):
            y_hat, _ = model.apply(params, x, R, lengths)
            return masked_mse_loss(y_hat, y_tgt, lengths=lengths)

        g = jax.grad(loss)(variables)
        return sum(float(jnp.abs(l).sum())
                   for l in jax.tree_util.tree_leaves(g))

    assert mse_grad_norm("In2OutHighwayNet") > 0
    assert mse_grad_norm("In2OutRNNHighwayNet") == 0.0


@pytest.mark.parametrize("name", ["SRURNN", "LSTMRNN", "MLP"])
def test_compute_dtype_bf16_close_to_f32(name):
    """bf16 matmuls (f32 accumulation) must track the f32 path closely and
    share the same param structure (checkpoints are dtype-agnostic)."""
    kw = dict(in_dim=12, out_dim=6, num_hidden=2, hidden_dim=16,
              last_sigmoid=False)
    m32 = create_model(name, **kw)
    m16 = create_model(name, compute_dtype="bfloat16", **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 40, 12))
    lengths = jnp.array([40, 30, 17])
    v = m32.init(jax.random.PRNGKey(1), x, lengths)
    y32 = np.asarray(m32.apply(v, x, lengths))
    y16 = np.asarray(m16.apply(v, x, lengths))  # same params, bf16 compute
    assert y16.dtype == np.float32
    scale = np.abs(y32).max()
    assert np.abs(y32 - y16).max() < 0.03 * max(scale, 1.0)

    def loss(params):
        return jnp.sum(m16.apply(params, x, lengths) ** 2)

    g = jax.grad(loss)(v)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_sru_dropout_is_variational():
    """SRU dropout (rnn_dropout + inter-layer) matches the reference SRU's
    semantics: ONE (B, D) Bernoulli mask shared across every timestep
    (cuda_functional get_dropout_mask_((batch, dim)).expand_as(x)), with
    inverted scaling — not torch nn.Dropout's per-element masks."""
    from gantts_tpu.models.sru import SRU

    m = SRU(hidden_dim=8, num_layers=1)
    x = jnp.ones((16, 4, 6), jnp.float32)  # time-major (T, B, D)
    y = np.asarray(m.apply({}, x, 0.5, False, method=SRU._vdrop,
                           rngs={"dropout": jax.random.PRNGKey(0)}))
    assert np.all(y == y[0])                      # same mask at every t
    assert set(np.unique(y).tolist()) <= {0.0, 2.0}   # 1/keep scaling
    assert 0.0 in np.unique(y)                    # something was dropped
    y2 = np.asarray(m.apply({}, x, 0.5, True, method=SRU._vdrop,
                            rngs={"dropout": jax.random.PRNGKey(0)}))
    np.testing.assert_array_equal(y2, np.asarray(x))  # eval mode: identity
    y3 = np.asarray(m.apply({}, x, 0.5, False, method=SRU._vdrop,
                            rngs={"dropout": jax.random.PRNGKey(1)}))
    assert not np.array_equal(y, y3)              # fresh key, fresh mask
