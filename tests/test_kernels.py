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


def test_fused_sru_layer_matches_fallback():
    """Fused Pallas SRU layer (interpret mode on CPU) == pure-JAX fallback,
    forward and gradient, both directions."""
    import jax
    import jax.numpy as jnp

    from gantts_tpu.kernels import fused_sru_layer
    from gantts_tpu.models.sru import linear_recurrence

    rs = np.random.RandomState(0)
    T, B, H = 23, 3, 5
    lengths = jnp.asarray(np.array([23, 15, 7], np.int32))
    u = jnp.asarray(rs.randn(T, B, 4 * H).astype(np.float32))

    def fallback(u, reverse, use_relu):
        mask = (jnp.arange(T)[:, None] < lengths[None, :]).astype(u.dtype)
        mask = mask[:, :, None]
        ud = jnp.flip(u, 0) if reverse else u
        md = jnp.flip(mask, 0) if reverse else mask
        x_t = ud[..., :H]
        f = jax.nn.sigmoid(ud[..., H:2 * H])
        r = jax.nn.sigmoid(ud[..., 2 * H:3 * H])
        x_p = ud[..., 3 * H:]
        f_m = f * md + (1 - md)
        b_m = (1 - f) * x_t * md
        c = linear_recurrence(f_m, b_m, axis=0)
        g = jax.nn.relu if use_relu else jnp.tanh
        h = (r * g(c) + (1 - r) * x_p) * md
        return jnp.flip(h, 0) if reverse else h

    for reverse in (False, True):
        for use_relu in (0, 1):
            h_ref = fallback(u, reverse, use_relu)
            h_fused = fused_sru_layer(u, lengths, reverse=reverse,
                                      use_relu=use_relu)
            assert np.allclose(np.asarray(h_fused), np.asarray(h_ref),
                               atol=2e-5), (reverse, use_relu)

            tgt = jnp.asarray(rs.randn(T, B, H).astype(np.float32))

            def loss_fused(u):
                return jnp.sum((fused_sru_layer(
                    u, lengths, reverse=reverse, use_relu=use_relu)
                    - tgt) ** 2)

            def loss_ref(u):
                return jnp.sum((fallback(u, reverse, use_relu) - tgt) ** 2)

            g_fused = np.asarray(jax.grad(loss_fused)(u))
            g_ref = np.asarray(jax.grad(loss_ref)(u))
            scale = np.abs(g_ref).max()
            assert np.abs(g_fused - g_ref).max() < 1e-4 * max(scale, 1.0), \
                (reverse, use_relu)


def test_fused_sru_layer_bf16_io():
    """bf16-I/O fused kernel (interpret mode) tracks the f32 path closely
    for forward and gradient."""
    import jax
    import jax.numpy as jnp

    from gantts_tpu.kernels import fused_sru_layer

    rs = np.random.RandomState(1)
    T, B, H = 20, 2, 4
    lengths = jnp.asarray(np.array([20, 11], np.int32))
    u = jnp.asarray(rs.randn(T, B, 4 * H).astype(np.float32))

    h32 = fused_sru_layer(u, lengths, reverse=False, use_relu=1)
    h16 = fused_sru_layer(u.astype(jnp.bfloat16), lengths, reverse=False,
                          use_relu=1)
    assert h16.dtype == jnp.bfloat16
    scale = float(jnp.abs(h32).max())
    assert float(jnp.abs(h32 - h16.astype(jnp.float32)).max()) \
        < 0.05 * max(scale, 1.0)

    def loss16(u):
        out = fused_sru_layer(u.astype(jnp.bfloat16), lengths,
                              reverse=False, use_relu=1)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss32(u):
        return jnp.sum(fused_sru_layer(u, lengths, reverse=False,
                                       use_relu=1) ** 2)

    g16 = np.asarray(jax.grad(loss16)(u))
    g32 = np.asarray(jax.grad(loss32)(u))
    gs = np.abs(g32).max()
    assert np.abs(g16 - g32).max() < 0.08 * max(gs, 1.0)


def test_fused_sru_layer_bias_gradient():
    """In-kernel bias add + in-kernel dbias accumulation must match autodiff
    of the external ``u + bias`` formulation."""
    import jax
    import jax.numpy as jnp

    from gantts_tpu.kernels import fused_sru_layer

    rs = np.random.RandomState(2)
    T, B, H = 19, 3, 4
    lengths = jnp.asarray(np.array([19, 12, 5], np.int32))
    u = jnp.asarray(rs.randn(T, B, 4 * H).astype(np.float32))
    bias4 = jnp.asarray(
        np.r_[np.zeros(H), rs.randn(2 * H), np.zeros(H)].astype(np.float32))
    tgt = jnp.asarray(rs.randn(T, B, H).astype(np.float32))

    def loss_inkernel(u, b):
        out = fused_sru_layer(u, lengths, bias4=b, reverse=True, use_relu=0)
        return jnp.sum((out - tgt) ** 2)

    def loss_external(u, b):
        out = fused_sru_layer(u + b, lengths, reverse=True, use_relu=0)
        return jnp.sum((out - tgt) ** 2)

    l1 = float(loss_inkernel(u, bias4))
    l2 = float(loss_external(u, bias4))
    assert abs(l1 - l2) < 1e-3 * max(abs(l2), 1.0)

    g1u, g1b = jax.grad(loss_inkernel, argnums=(0, 1))(u, bias4)
    g2u, g2b = jax.grad(loss_external, argnums=(0, 1))(u, bias4)
    assert np.allclose(np.asarray(g1u), np.asarray(g2u), atol=1e-4)
    # the in-kernel bias applies to the f/r gate blocks only (the x~ and x'
    # blocks carry no bias in the SRU cell); compare those blocks and check
    # the structurally-unused blocks report zero gradient
    g1b, g2b = np.asarray(g1b), np.asarray(g2b)
    assert np.allclose(g1b[H:3 * H], g2b[H:3 * H], atol=1e-3), \
        np.abs(g1b[H:3 * H] - g2b[H:3 * H]).max()
    assert (g1b[:H] == 0).all() and (g1b[3 * H:] == 0).all()
