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


def test_fused_sru_proj_layer_matches_unfused():
    """Projection-fused SRU kernel (in-kernel x@W, in-kernel dx/dW)
    == matmul_cast + u-based fused kernel: forward EXACT, all gradients
    (dx, dW, dbias) to f32 accumulation-order noise; both directions,
    ragged lengths, D/H not multiples of 128, T not a chunk multiple."""
    import jax
    import jax.numpy as jnp

    from gantts_tpu.kernels import fused_sru_layer, fused_sru_proj_layer
    from gantts_tpu.models.common import matmul_cast

    rs = np.random.RandomState(3)
    T, B, D, H = 37, 5, 70, 48
    x = jnp.asarray(rs.randn(T, B, D).astype(np.float32))
    w = jnp.asarray((rs.randn(D, 4 * H) * 0.1).astype(np.float32))
    bias4 = jnp.concatenate([
        jnp.zeros(H), jnp.asarray(rs.randn(H), jnp.float32) * 0.1,
        jnp.asarray(rs.randn(H), jnp.float32) * 0.1, jnp.zeros(H)])
    lengths = jnp.asarray(np.r_[rs.randint(5, T, B - 1), T].astype(np.int32))

    for reverse in (False, True):
        for use_relu in (0, 1):
            def ref_path(x, w, b4):
                u = matmul_cast(x, w, "float32")
                return fused_sru_layer(u, lengths, bias4=b4,
                                       reverse=reverse, use_relu=use_relu)

            def new_path(x, w, b4):
                return fused_sru_proj_layer(
                    x, w, lengths, bias4=b4, reverse=reverse,
                    use_relu=use_relu, compute_dtype="float32")

            h_ref = np.asarray(ref_path(x, w, bias4))
            h_new = np.asarray(new_path(x, w, bias4))
            assert np.array_equal(h_ref, h_new), (reverse, use_relu)

            gr = jax.grad(lambda *a: jnp.sum(jnp.sin(ref_path(*a))),
                          argnums=(0, 1, 2))(x, w, bias4)
            gn = jax.grad(lambda *a: jnp.sum(jnp.sin(new_path(*a))),
                          argnums=(0, 1, 2))(x, w, bias4)
            for name, a, b in zip(("dx", "dw", "db"), gr, gn):
                a, b = np.asarray(a), np.asarray(b)
                scale = max(np.abs(a).max(), 1.0)
                assert np.abs(a - b).max() < 2e-5 * scale, \
                    (name, reverse, use_relu, np.abs(a - b).max())


def test_fused_sru_proj_layer_bf16():
    """bf16 proj-fused kernel == bf16 matmul_cast + bf16 u-based kernel:
    forward exact, dW/db exact up to reduction order; dx within one bf16
    quantization (the kernel emits dx in the I/O dtype)."""
    import jax
    import jax.numpy as jnp

    from gantts_tpu.kernels import fused_sru_layer, fused_sru_proj_layer
    from gantts_tpu.models.common import matmul_cast

    rs = np.random.RandomState(4)
    T, B, D, H = 40, 4, 96, 64
    x = jnp.asarray(rs.randn(T, B, D).astype(np.float32))
    w = jnp.asarray((rs.randn(D, 4 * H) * 0.1).astype(np.float32))
    bias4 = jnp.concatenate([
        jnp.zeros(H), jnp.asarray(rs.randn(H), jnp.float32) * 0.1,
        jnp.asarray(rs.randn(H), jnp.float32) * 0.1, jnp.zeros(H)])
    lengths = jnp.asarray(np.r_[rs.randint(5, T, B - 1), T].astype(np.int32))

    def ref_path(x, w, b4):
        u = matmul_cast(x, w, "bfloat16").astype(jnp.bfloat16)
        return fused_sru_layer(u, lengths, bias4=b4, reverse=True,
                               use_relu=0)

    def new_path(x, w, b4):
        return fused_sru_proj_layer(x, w, lengths, bias4=b4, reverse=True,
                                    use_relu=0, compute_dtype="bfloat16")

    h_ref = ref_path(x, w, bias4)
    h_new = new_path(x, w, bias4)
    assert h_new.dtype == jnp.bfloat16
    assert np.array_equal(np.asarray(h_ref, np.float32),
                          np.asarray(h_new, np.float32))

    gr = jax.grad(lambda *a: jnp.sum(ref_path(*a).astype(jnp.float32) ** 2),
                  argnums=(0, 1, 2))(x, w, bias4)
    gn = jax.grad(lambda *a: jnp.sum(new_path(*a).astype(jnp.float32) ** 2),
                  argnums=(0, 1, 2))(x, w, bias4)
    tols = {"dx": 1e-2, "dw": 1e-4, "db": 1e-4}
    for name, a, b in zip(("dx", "dw", "db"), gr, gn):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1.0)
        assert np.abs(a - b).max() < tols[name] * scale, \
            (name, np.abs(a - b).max(), scale)


def test_sru_proj_feasibility_gate():
    """Oversized D x H must fall back (never compile to a Mosaic VMEM OOM);
    production shapes must take the fused path."""
    from gantts_tpu.kernels import sru_proj_feasible

    assert sru_proj_feasible(20, 1024, 512, "bfloat16")   # bench flagship
    assert sru_proj_feasible(20, 425, 512, "bfloat16")    # first layer
    assert sru_proj_feasible(96, 1024, 512, "bfloat16")   # big batch
    assert not sru_proj_feasible(8, 16384, 8192, "float32")


# ---------------- fused LSTM layer kernel (kernels/lstm_scan.py) ----------


def _lstm_scan_oracle(xp, w_hh, bias, lengths, reverse, cd=None):
    """The models/recurrent.py lax.scan body, as the kernel's oracle.
    xp: (T, B, 4H) pre-activations WITHOUT bias."""
    import jax
    import jax.numpy as jnp

    T, B, H4 = xp.shape
    H = H4 // 4
    cd = xp.dtype if cd is None else cd
    mask = (jnp.arange(T)[:, None] < lengths[None, :]).astype(jnp.float32)
    mask = mask[:, :, None]
    xpb = xp.astype(jnp.float32) + bias
    if reverse:
        xpb = jnp.flip(xpb, 0)
        mask = jnp.flip(mask, 0)
    w_hh_c = w_hh.astype(cd)

    def step(carry, inputs):
        h, c = carry
        xp_t, m_t = inputs
        gates = xp_t + jnp.matmul(h.astype(cd), w_hh_c,
                                  preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        h = m_t * h_new + (1.0 - m_t) * h
        c = m_t * c_new + (1.0 - m_t) * c
        return (h, c), h_new * m_t

    h0 = jnp.zeros((B, H), jnp.float32)
    (_, _), ys = jax.lax.scan(step, (h0, h0), (xpb, mask))
    return jnp.flip(ys, 0) if reverse else ys


def test_fused_lstm_layer_matches_scan():
    """Fused Pallas LSTM (interpret mode on CPU) == masked lax.scan oracle:
    forward and ALL gradients (dxp, dW_hh, dbias), both directions, ragged
    lengths, H not a multiple of 128 and T not a multiple of the chunk."""
    import jax
    import jax.numpy as jnp

    from gantts_tpu.kernels import fused_lstm_layer

    rs = np.random.RandomState(3)
    T, B, H = 21, 3, 6
    lengths = jnp.asarray(np.array([21, 13, 5], np.int32))
    xp = jnp.asarray(rs.randn(T, B, 4 * H).astype(np.float32) * 0.5)
    w_hh = jnp.asarray(rs.randn(H, 4 * H).astype(np.float32) * 0.3)
    bias = jnp.asarray(rs.randn(4 * H).astype(np.float32) * 0.1)
    tgt = jnp.asarray(rs.randn(T, B, H).astype(np.float32))

    for reverse in (False, True):
        y_ref = _lstm_scan_oracle(xp, w_hh, bias, lengths, reverse)
        y_fused = fused_lstm_layer(xp, w_hh, bias, lengths, reverse=reverse)
        assert np.allclose(np.asarray(y_fused), np.asarray(y_ref),
                           atol=2e-5), reverse
        # padded frames must be exactly zero
        m = np.arange(T)[:, None] < np.asarray(lengths)[None, :]
        assert (np.asarray(y_fused)[~m] == 0).all()

        def loss_fused(xp, w_hh, bias):
            y = fused_lstm_layer(xp, w_hh, bias, lengths, reverse=reverse)
            return jnp.sum((y - tgt) ** 2)

        def loss_ref(xp, w_hh, bias):
            y = _lstm_scan_oracle(xp, w_hh, bias, lengths, reverse)
            return jnp.sum((y - tgt) ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(xp, w_hh, bias)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(xp, w_hh, bias)
        for a, b, name in zip(gf, gr, ("dxp", "dw_hh", "dbias")):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=3e-4), \
                (reverse, name, np.abs(np.asarray(a) - np.asarray(b)).max())


def test_lstm_layer_module_kernel_vs_fallback(monkeypatch):
    """models/recurrent.py LSTMLayer must produce the same output and
    parameter gradients through the Pallas path (interpret mode) and the
    lax.scan fallback."""
    import jax
    import jax.numpy as jnp

    from gantts_tpu import kernels
    from gantts_tpu.models.recurrent import StackedLSTM

    rs = np.random.RandomState(0)
    B, T, D, H = 3, 19, 7, 6
    x = jnp.asarray(rs.randn(B, T, D).astype(np.float32))
    lengths = jnp.asarray(np.array([19, 11, 4], np.int32))
    m = StackedLSTM(hidden_dim=H, num_layers=2, bidirectional=True)
    v = m.init(jax.random.PRNGKey(0), x, lengths)

    def run():
        out = m.apply(v, x, lengths, deterministic=True)
        g = jax.grad(lambda v: jnp.sum(
            m.apply(v, x, lengths, deterministic=True) ** 2))(v)
        return out, g

    monkeypatch.setattr(kernels, "default_use_pallas", lambda: True)
    out_k, g_k = run()
    monkeypatch.setattr(kernels, "default_use_pallas", lambda: False)
    out_s, g_s = run()

    assert np.allclose(np.asarray(out_k), np.asarray(out_s), atol=3e-5)
    lk = jax.tree_util.tree_leaves(g_k)
    ls = jax.tree_util.tree_leaves(g_s)
    for a, b in zip(lk, ls):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-3), \
            np.abs(np.asarray(a) - np.asarray(b)).max()


def test_fused_lstm_proj_layer_matches_unfused():
    """Projection-fused LSTM forward (in-kernel x@W_ih) == matmul_cast +
    xp-based fused kernel: forward exact, all gradients (dx, dW_ih, dW_hh,
    dbias) to accumulation-order noise; both directions, f32 and bf16."""
    import jax
    import jax.numpy as jnp

    from gantts_tpu.kernels import fused_lstm_layer, fused_lstm_proj_layer
    from gantts_tpu.models.common import matmul_cast

    rs = np.random.RandomState(5)
    T, B, D, H = 21, 3, 11, 9
    x = jnp.asarray(rs.randn(T, B, D).astype(np.float32))
    w_ih = jnp.asarray(rs.randn(D, 4 * H).astype(np.float32) * 0.3)
    w_hh = jnp.asarray(rs.randn(H, 4 * H).astype(np.float32) * 0.3)
    bias = jnp.asarray(rs.randn(4 * H).astype(np.float32) * 0.1)
    lengths = jnp.asarray(np.array([21, 13, 5], np.int32))

    # The in-kernel dot_general and the standalone matmul_cast may
    # accumulate in different orders on the CPU (interpret-mode) backend,
    # so "exact" here means within a few f32 ULPs (f32) / one bf16 ULP
    # (bf16) of the output scale; on TPU both run the same MXU tiling.
    for cd, fwd_tol, g_tol in (("float32", 5e-7, 2e-5), ("bfloat16", 1 / 256,
                                                         2e-2)):
        for reverse in (False, True):
            def ref_path(x, wi, wh, b):
                xp = matmul_cast(x, wi, cd)
                if cd == "bfloat16":
                    xp = xp.astype(jnp.bfloat16)
                return fused_lstm_layer(xp, wh, b, lengths, reverse=reverse)

            def new_path(x, wi, wh, b):
                return fused_lstm_proj_layer(x, wi, wh, b, lengths,
                                             reverse=reverse,
                                             compute_dtype=cd)

            y_ref = np.asarray(ref_path(x, w_ih, w_hh, bias), np.float32)
            y_new = np.asarray(new_path(x, w_ih, w_hh, bias), np.float32)
            y_scale = max(np.abs(y_ref).max(), 1.0)
            assert np.abs(y_ref - y_new).max() <= fwd_tol * y_scale, \
                (cd, reverse, np.abs(y_ref - y_new).max())

            gr = jax.grad(
                lambda *a: jnp.sum(ref_path(*a).astype(jnp.float32) ** 2),
                argnums=(0, 1, 2, 3))(x, w_ih, w_hh, bias)
            gn = jax.grad(
                lambda *a: jnp.sum(new_path(*a).astype(jnp.float32) ** 2),
                argnums=(0, 1, 2, 3))(x, w_ih, w_hh, bias)
            for name, a, b in zip(("dx", "dwih", "dwhh", "db"), gr, gn):
                a = np.asarray(a, np.float32)
                b = np.asarray(b, np.float32)
                scale = max(np.abs(a).max(), 1.0)
                assert np.abs(a - b).max() < g_tol * scale, \
                    (cd, reverse, name, np.abs(a - b).max(), scale)


def test_fused_bilstm_proj_layer_matches_single_direction():
    """Bidirectional fused LSTM kernel (both directions in ONE grid) ==
    two single-direction projection-fused layers (themselves pinned to the
    scan oracle): forward and all gradients (dx, dW_ih, dW_hh, dbias for
    both directions), f32 and bf16, ragged lengths, off-tile shapes."""
    import jax
    import jax.numpy as jnp

    from gantts_tpu.kernels import (fused_bilstm_proj_layer,
                                    fused_lstm_proj_layer)

    rs = np.random.RandomState(7)
    T, B, D, H = 21, 3, 11, 9
    x = jnp.asarray(rs.randn(T, B, D).astype(np.float32))
    lengths = jnp.asarray(np.array([21, 13, 5], np.int32))
    pf = {k: jnp.asarray(v) for k, v in
          dict(w_ih=rs.randn(D, 4 * H).astype(np.float32) * 0.3,
               w_hh=rs.randn(H, 4 * H).astype(np.float32) * 0.3,
               bias=rs.randn(4 * H).astype(np.float32) * 0.1).items()}
    pb = {k: jnp.asarray(v) for k, v in
          dict(w_ih=rs.randn(D, 4 * H).astype(np.float32) * 0.3,
               w_hh=rs.randn(H, 4 * H).astype(np.float32) * 0.3,
               bias=rs.randn(4 * H).astype(np.float32) * 0.1).items()}

    for cd, fwd_tol, g_tol in (("float32", 5e-6, 5e-5),
                               ("bfloat16", 1 / 128, 3e-2)):
        def ref_path(x, pf, pb):
            yf = fused_lstm_proj_layer(x, pf["w_ih"], pf["w_hh"],
                                       pf["bias"], lengths, reverse=False,
                                       compute_dtype=cd)
            yb = fused_lstm_proj_layer(x, pb["w_ih"], pb["w_hh"],
                                       pb["bias"], lengths, reverse=True,
                                       compute_dtype=cd)
            return yf, yb

        def new_path(x, pf, pb):
            return fused_bilstm_proj_layer(x, pf, pb, lengths,
                                           compute_dtype=cd)

        yr = ref_path(x, pf, pb)
        yn = new_path(x, pf, pb)
        for a, b, which in zip(yr, yn, ("fwd", "bwd")):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            scale = max(np.abs(a).max(), 1.0)
            assert np.abs(a - b).max() <= fwd_tol * scale, \
                (cd, which, np.abs(a - b).max())
            # padded frames exactly zero
            m = np.arange(T)[:, None] < np.asarray(lengths)[None, :]
            assert (b[~m] == 0).all(), (cd, which)

        def loss(path):
            def f(x, pf, pb):
                yf, yb = path(x, pf, pb)
                y = jnp.concatenate([yf, yb], -1).astype(jnp.float32)
                return jnp.sum(y ** 2) + jnp.sum(y[:, :, ::2] ** 3)
            return f

        gr = jax.grad(loss(ref_path), argnums=(0, 1, 2))(x, pf, pb)
        gn = jax.grad(loss(new_path), argnums=(0, 1, 2))(x, pf, pb)
        for a, b in zip(jax.tree_util.tree_leaves(gr),
                        jax.tree_util.tree_leaves(gn)):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            scale = max(np.abs(a).max(), 1.0)
            assert np.abs(a - b).max() < g_tol * scale, \
                (cd, np.abs(a - b).max(), scale)


def test_fused_lstm_layer_bf16_io():
    """bf16 xp I/O: in-kernel math/carries stay f32, so the result must
    track the f32 oracle to bf16 tolerance."""
    import jax.numpy as jnp

    from gantts_tpu.kernels import fused_lstm_layer

    rs = np.random.RandomState(1)
    T, B, H = 24, 4, 8
    lengths = jnp.asarray(np.array([24, 18, 9, 2], np.int32))
    xp = jnp.asarray(rs.randn(T, B, 4 * H).astype(np.float32) * 0.5)
    w_hh = jnp.asarray(rs.randn(H, 4 * H).astype(np.float32) * 0.3)
    bias = jnp.asarray(rs.randn(4 * H).astype(np.float32) * 0.1)

    y_ref = _lstm_scan_oracle(xp, w_hh, bias, lengths, False)
    y16 = fused_lstm_layer(xp.astype(jnp.bfloat16), w_hh, bias, lengths)
    assert y16.dtype == jnp.bfloat16
    err = np.abs(np.asarray(y16, np.float32) - np.asarray(y_ref))
    assert err.max() < 0.05, err.max()
