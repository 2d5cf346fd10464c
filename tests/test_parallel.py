"""Data-parallel equivalence: the 8-device sharded GAN step must produce the
same losses, metrics and parameter updates as the single-device step (the
losses are global sums normalized by global mask sums, so GSPMD's inserted
psums must reproduce the unsharded math)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gantts_tpu import hparams
from gantts_tpu.core.windows import unit_variance_mlpg_matrix
from gantts_tpu.parallel import (
    DataParallelGanTrainer,
    batch_sharding,
    make_mesh,
    pad_batch_to_devices,
    replicated,
)
from gantts_tpu.train import GanTrainer, StepConfig
from gantts_tpu.train.setup import init_models_and_states


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_step_matches_single_device():
    hp = hparams.vc.copy()
    hp.order = 9
    hp.stream_sizes = [27]
    hp.generator_params.update(in_dim=27, out_dim=27, static_dim=9,
                               num_hidden=1, hidden_dim=16, dropout=0.0)
    hp.discriminator_params.update(in_dim=9, num_hidden=1, hidden_dim=8,
                                   dropout=0.0)

    model_g, model_d, tx_g, tx_d, gstate, dstate = init_models_and_states(hp)
    cfg = StepConfig.from_hparams(hp, w_d=1.0, mse_w=0.5, mge_w=1.0,
                                  update_d=True, update_g=True)
    Y_mean = np.zeros(27, np.float32)
    Y_std = np.ones(27, np.float32)

    B, T = 16, 64
    rs = np.random.RandomState(0)
    x = rs.rand(B, T, 27).astype(np.float32)
    y = rs.rand(B, T, 27).astype(np.float32)
    lengths = np.r_[rs.randint(T // 2, T, B - 1), T].astype(np.int32)
    R = unit_variance_mlpg_matrix(hp.windows, T)
    rng = jax.random.PRNGKey(7)
    adv_w = jnp.float32(0.7)

    # single device
    tr1 = GanTrainer(model_g, model_d, tx_g, tx_d, cfg, Y_mean, Y_std)
    g1, d1, out1 = tr1.step_fn(True)(
        gstate, dstate, None, jnp.asarray(x), jnp.asarray(y),
        jnp.asarray(lengths), jnp.asarray(R), None, adv_w, rng)

    # 8-device mesh (reinit states: the single-device step donated them)
    model_g, model_d, tx_g, tx_d, gstate, dstate = init_models_and_states(hp)
    mesh = make_mesh(8)
    tr8 = DataParallelGanTrainer(model_g, model_d, tx_g, tx_d, cfg,
                                 Y_mean, Y_std, mesh=mesh)
    xs = jax.device_put(x, batch_sharding(mesh))
    ys = jax.device_put(y, batch_sharding(mesh))
    ls = jax.device_put(lengths, batch_sharding(mesh))
    Rs = jax.device_put(jnp.asarray(R), replicated(mesh))
    g8, d8, out8 = tr8.step_fn(True)(
        gstate, dstate, None, xs, ys, ls, Rs, None, adv_w, rng)

    for k in ("generator", "discriminator", "mge", "mse", "loss_adv", "mcd",
              "real_correct_count", "fake_correct_count", "num_frames"):
        v1, v8 = float(out1[k]), float(out8[k])
        assert np.isclose(v1, v8, rtol=2e-4, atol=1e-5), (k, v1, v8)

    # updated parameters must match leaf-by-leaf
    l1 = jax.tree_util.tree_leaves(jax.device_get(g1.params))
    l8 = jax.tree_util.tree_leaves(jax.device_get(g8.params))
    for a, b in zip(l1, l8):
        assert np.allclose(a, b, atol=5e-5), np.abs(a - b).max()
    l1 = jax.tree_util.tree_leaves(jax.device_get(d1.params))
    l8 = jax.tree_util.tree_leaves(jax.device_get(d8.params))
    for a, b in zip(l1, l8):
        assert np.allclose(a, b, atol=5e-5), np.abs(a - b).max()


def test_pad_batch_to_devices():
    x = np.ones((5, 3, 2), np.float32)
    lengths = np.array([3, 3, 3, 3, 3], np.int32)
    (xp,), lp = pad_batch_to_devices([x], lengths, 4)
    assert xp.shape[0] == 8 and lp.shape[0] == 8
    assert (lp[5:] == 0).all()
    (xq,), lq = pad_batch_to_devices([x], lengths, 5)
    assert xq.shape[0] == 5 and (lq == lengths).all()
