"""End-to-end training-engine tests on synthetic corpora (CPU, small shapes).

Covers the reference's five BASELINE.json configs in miniature: MGE-only VC,
GAN VC, duration model, adversarial acoustic model with stream selection +
mgc masking + linguistic conditioning, and checkpoint/resume + the
discriminator-warmup and spoofing-rate paths of the curriculum."""

import json
import os
import subprocess
import sys
from os.path import dirname, exists, join

import numpy as np
import pytest

REPO = dirname(dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture(scope="module")
def vc_corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("vcdata"))
    from tests.make_synthetic_data import make_vc

    make_vc(d, num=16, order=19)
    return d


@pytest.fixture(scope="module")
def acoustic_corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("acdata"))
    from tests.make_synthetic_data import make_acoustic

    make_acoustic(d, num=14)
    return d


def test_reference_hparams_string_parses():
    """CLI-surface parity: a reference-style --hparams string, including
    the torch-only pin_memory knob (accepted no-op), must parse."""
    from gantts_tpu import hparams

    hp = hparams.vc.copy()
    hp.parse("batch_size=16,num_workers=2,pin_memory=False,cache_size=800")
    assert hp.batch_size == 16 and hp.num_workers == 2
    assert hp.pin_memory is False and hp.cache_size == 800
    with pytest.raises(ValueError):
        hp.parse("not_a_real_knob=1")


def _small_vc_hp():
    from gantts_tpu import hparams

    hp = hparams.vc.copy()
    hp.parse("nepoch=3,batch_size=4,batch_bucket_multiple=16")
    hp.order = 19
    hp.stream_sizes = [19 * 3]
    hp.generator_params.update(
        in_dim=None, out_dim=None, static_dim=19, num_hidden=1, hidden_dim=32)
    hp.discriminator_params.update(in_dim=19, num_hidden=1, hidden_dim=16)
    return hp


def _run_vc(vc_corpus, hp, w_d, mse_w=0.0, mge_w=1.0, update_g=True,
            ckpt=None, checkpoint_g=None, checkpoint_d=None, ref_params=None,
            global_epoch=0, steps_per_dispatch=1):
    from gantts_tpu.train import (
        GanTrainer, StepConfig, TrainState, load_checkpoint, train_loop)
    from gantts_tpu.train.setup import (
        init_models_and_states, load_arrays, prepare_vc)

    X, Y, lens = load_arrays(join(vc_corpus, "X"), join(vc_corpus, "Y"))
    loaders, Y_mean, Y_std = prepare_vc(X, Y, lens, hp, vc_corpus)
    model_g, model_d, tx_g, tx_d, gstate, dstate = init_models_and_states(hp)
    if checkpoint_g:
        params, opt, ep = load_checkpoint(checkpoint_g,
                                          opt_template=gstate.opt_state)
        gstate = TrainState(params=params, opt_state=opt)
    if checkpoint_d:
        params, opt, ep = load_checkpoint(checkpoint_d,
                                          opt_template=dstate.opt_state)
        dstate = TrainState(params=params, opt_state=opt)
    cfg = StepConfig.from_hparams(hp, w_d, mse_w, mge_w, w_d > 0, update_g,
                                  has_ref=ref_params is not None)
    trainer = GanTrainer(model_g, model_d, tx_g, tx_d, cfg, Y_mean, Y_std)

    class Recorder:
        def __init__(self):
            self.rows = []

        def log_value(self, name, value, step):
            self.rows.append((name, float(value), step))

        def flush(self):
            pass

    rec = Recorder()
    gstate, dstate, ep = train_loop(
        trainer, gstate, dstate, ref_params, loaders, hp,
        w_d=w_d, mse_w=mse_w, mge_w=mge_w, update_d=w_d > 0,
        update_g=update_g, checkpoint_dir=ckpt, writer=rec,
        global_epoch=global_epoch, steps_per_dispatch=steps_per_dispatch)
    return gstate, dstate, rec.rows


def _series(rows, name):
    return [v for (n, v, s) in rows if n == name]


def test_vc_mge_only_loss_decreases(vc_corpus):
    """BASELINE config #1: MGE-only In2OutHighwayNet VC."""
    hp = _small_vc_hp()
    _, _, rows = _run_vc(vc_corpus, hp, w_d=0.0)
    mge = _series(rows, "train mge loss")
    assert len(mge) == 3
    assert mge[-1] < mge[0], f"MGE did not decrease: {mge}"
    assert all(np.isfinite(mge))
    mcd = _series(rows, "train mcd metric")
    assert len(mcd) == 3 and all(np.isfinite(mcd))
    assert mcd[-1] < mcd[0]
    # D-only series must be absent when w_d = 0 (reference train.py:610-620)
    assert not _series(rows, "train discriminator loss")


def test_vc_gan_mode(vc_corpus):
    """Adversarial mode: D losses logged, finite, accuracies in [0, 1]."""
    hp = _small_vc_hp()
    _, _, rows = _run_vc(vc_corpus, hp, w_d=1.0)
    for name in ("train discriminator loss", "train loss_adv loss",
                 "train generator loss", "E(mge)", "E(adv)"):
        vals = _series(rows, name)
        assert vals and all(np.isfinite(vals)), name
    for name in ("Real train acc", "Fake train acc"):
        vals = _series(rows, name)
        assert vals and all(0.0 <= v <= 1.0 for v in vals), (name, vals)


def test_checkpoint_resume_and_warmup(vc_corpus, tmp_path):
    """Curriculum mechanics: save -> D-warmup from G ckpt -> spoofing ref."""
    from gantts_tpu.train import load_checkpoint

    hp = _small_vc_hp()
    hp.nepoch = 10  # hits the checkpoint_interval=10 save
    ckpt_dir = str(tmp_path / "ckpt")
    os.makedirs(ckpt_dir)
    _run_vc(vc_corpus, hp, w_d=0.0, ckpt=ckpt_dir)
    g_path = join(ckpt_dir, "checkpoint_epoch10_Generator.pth")
    assert exists(g_path), os.listdir(ckpt_dir)

    params, opt, ep = load_checkpoint(g_path)
    assert ep == 10

    # discriminator warmup: G frozen (update_g=False), from the G checkpoint
    hp2 = _small_vc_hp()
    hp2.nepoch = 2
    _, dstate, rows = _run_vc(vc_corpus, hp2, w_d=1.0, update_g=False,
                              checkpoint_g=g_path)
    d_loss = _series(rows, "train discriminator loss")
    assert d_loss and all(np.isfinite(d_loss))
    assert not _series(rows, "train generator loss")  # G not updated

    # spoofing rate against a reference discriminator
    hp3 = _small_vc_hp()
    hp3.nepoch = 2
    _, _, rows = _run_vc(vc_corpus, hp3, w_d=1.0,
                         ref_params=dstate.params)
    sp = _series(rows, "train spoofing rate")
    assert sp and all(0.0 <= v <= 1.0 for v in sp)


def test_acoustic_gan_with_stream_selection(acoustic_corpus):
    """BASELINE config #4: mgc-stream adv loss + mask_nth_mgc +
    linguistic-conditioned discriminator + noise-input generator (config #5)."""
    from gantts_tpu import hparams
    from gantts_tpu.train import GanTrainer, StepConfig, train_loop
    from gantts_tpu.train.setup import (
        init_models_and_states, load_arrays, prepare_tts)

    hp = hparams.tts_acoustic.copy()
    hp.parse("nepoch=2,batch_size=4,batch_bucket_multiple=16,"
             "generator_add_noise=true,generator_noise_dim=8")
    hp.stream_sizes = [60, 3, 1, 3]
    hp.order = 20
    hp.generator_params.update(
        in_dim=None, out_dim=None, num_hidden=2, hidden_dim=16)
    hp.discriminator_params.update(in_dim=None, num_hidden=1, hidden_dim=16)

    X, Y, lens = load_arrays(join(acoustic_corpus, "X_acoustic"),
                             join(acoustic_corpus, "Y_acoustic"))
    loaders, Y_mean, Y_std = prepare_tts(X, Y, lens, hp, acoustic_corpus)
    # dim inference: selected mgc static (20) - mask 2 + linguistic 30
    assert hp.discriminator_params["in_dim"] == 20 - 2 + 30
    assert hp.generator_params["in_dim"] == 30 + 8  # lin + noise

    model_g, model_d, tx_g, tx_d, gstate, dstate = init_models_and_states(hp)
    cfg = StepConfig.from_hparams(hp, 1.0, 0.0, 1.0, True, True)
    trainer = GanTrainer(model_g, model_d, tx_g, tx_d, cfg, Y_mean, Y_std)

    rows = []

    class W:
        def log_value(self, n, v, s):
            rows.append((n, float(v), s))

        def flush(self):
            pass

    train_loop(trainer, gstate, dstate, None, loaders, hp,
               w_d=1.0, update_d=True, update_g=True, writer=W())
    mcds = [v for (n, v, s) in rows if n == "train mcd metric"]
    vuvs = [v for (n, v, s) in rows if n == "train vuv_err metric"]
    assert mcds and all(np.isfinite(mcds))
    assert vuvs and all(0 <= v <= 1 for v in vuvs)
    # stats were persisted under the eval-script names (train.py:748-751)
    for f in ("X_acoustic_data_min", "X_acoustic_data_max",
              "Y_acoustic_data_mean", "Y_acoustic_data_var"):
        assert exists(join(acoustic_corpus, f + ".npy"))


def test_train_cli_smoke(vc_corpus, tmp_path):
    """Drive the actual CLI (reference train.py:4-23 surface)."""
    ckpt = str(tmp_path / "ck")
    log = str(tmp_path / "log")
    # GANTTS_TPU_PLATFORM (config-update based) is the reliable pin;
    # JAX_PLATFORMS alone is intermittently ignored in subprocesses
    # (sitecustomize imports jax first — see CLAUDE.md), which leaves the
    # run on the axon TPU where compile latency blows the timeout.
    env = dict(os.environ, JAX_PLATFORMS="cpu", GANTTS_TPU_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, join(REPO, "train.py"),
         join(vc_corpus, "X"), join(vc_corpus, "Y"),
         "--hparams_name=vc",
         "--hparams=nepoch=1,batch_size=4,order=19,stream_sizes=[57],"
         "generator_params={'in_dim': None, 'out_dim': None, 'num_hidden': 1,"
         " 'hidden_dim': 16, 'static_dim': 19, 'dropout': 0.5},"
         "discriminator_params={'in_dim': 19, 'out_dim': 1, 'num_hidden': 1,"
         " 'hidden_dim': 8, 'dropout': 0.5, 'last_sigmoid': True}",
         "--w_d=0", f"--checkpoint-dir={ckpt}", f"--log-event-path={log}"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert exists(join(ckpt, "checkpoint_epoch1_Generator.pth"))
    with open(join(log, "scalars.jsonl")) as f:
        tags = {json.loads(line)["tag"] for line in f}
    assert "train mge loss" in tags and "test mcd metric" in tags


def test_vc_rnn_generator_gan(vc_corpus):
    """BASELINE config #2: VC with the RNN In2Out generator (masked
    sequence handling through the packed-equivalent LSTM trunk)."""
    hp = _small_vc_hp()
    hp.nepoch = 2
    hp.generator = "In2OutRNNHighwayNet"
    hp.generator_params = {
        "in_dim": None, "out_dim": None, "static_dim": 19,
        "num_hidden": 1, "hidden_dim": 16, "bidirectional": True,
        "dropout": 0.5,
    }
    _, _, rows = _run_vc(vc_corpus, hp, w_d=1.0)
    mge = _series(rows, "train mge loss")
    assert len(mge) == 2 and all(np.isfinite(mge))
    d = _series(rows, "train discriminator loss")
    assert d and all(np.isfinite(d))


def test_vc_bf16_compute_tracks_f32(vc_corpus):
    """compute_dtype=bfloat16 must train stably and track the f32 loss
    trajectory closely (same data order, same init, same rng)."""
    hp32 = _small_vc_hp()
    _, _, rows32 = _run_vc(vc_corpus, hp32, w_d=0.0)
    hp16 = _small_vc_hp()
    hp16.compute_dtype = "bfloat16"
    _, _, rows16 = _run_vc(vc_corpus, hp16, w_d=0.0)

    m32 = _series(rows32, "train mge loss")
    m16 = _series(rows16, "train mge loss")
    assert all(np.isfinite(m16))
    assert m16[-1] < m16[0]  # it trains
    for a, b in zip(m32, m16):
        assert abs(a - b) < 0.05 * max(abs(a), 1e-3), (m32, m16)


def test_saturated_discriminator_step_is_finite(vc_corpus):
    """A warmed-up D that saturates to sigmoid == 1.0 exactly (f32) must not
    produce non-finite losses or params in the jitted adversarial step.

    Regression: ``log(1 - D + EPS)`` let XLA reassociate the constants into
    ``(1 + EPS) - D == 1.0 - D`` under jit, so the first adversarial step
    after D-warmup emitted -inf -> NaN params (eager was finite).  The step
    now uses ``log(max(p, EPS))``, which no rewrite can break."""
    import jax
    import jax.numpy as jnp

    from gantts_tpu.core.windows import unit_variance_mlpg_matrix
    from gantts_tpu.train import GanTrainer, StepConfig
    from gantts_tpu.train.setup import (
        init_models_and_states, load_arrays, prepare_vc)

    hp = _small_vc_hp()
    X, Y, lens = load_arrays(join(vc_corpus, "X"), join(vc_corpus, "Y"))
    loaders, Y_mean, Y_std = prepare_vc(X, Y, lens, hp, vc_corpus)
    model_g, model_d, tx_g, tx_d, gstate, dstate = init_models_and_states(hp)

    # Saturate D: huge final bias -> sigmoid(z) rounds to exactly 1.0 in f32
    # on every frame, real and fake alike.
    dparams = jax.tree.map(lambda a: a, dstate.params)  # shallow copy
    bias = dparams["params"]["last_linear"]["bias"]
    dparams["params"]["last_linear"]["bias"] = jnp.full_like(bias, 100.0)
    dstate = dstate.replace(params=dparams)

    cfg = StepConfig.from_hparams(hp, w_d=1.0, mse_w=0.0, mge_w=1.0,
                                  update_d=True, update_g=True)
    trainer = GanTrainer(model_g, model_d, tx_g, tx_d, cfg, Y_mean, Y_std,
                         windows=hp.windows)
    step = trainer.step_fn(True)

    x, y, lengths = next(iter(loaders["train"]))
    T = x.shape[1]
    R = jnp.asarray(unit_variance_mlpg_matrix(hp.windows, T), jnp.float32)
    g2, d2, out, _ = step(gstate, dstate, None, jnp.asarray(x), jnp.asarray(y),
                       jnp.asarray(lengths), R, None, jnp.float32(1.0),
                       jax.random.PRNGKey(0))
    out = jax.device_get(out)
    bad = {k: v for k, v in out.items()
           if np.asarray(v).dtype.kind == "f"
           and not np.isfinite(np.asarray(v)).all()}
    assert not bad, f"non-finite step outputs with saturated D: {bad}"
    for state, name in ((g2, "G"), (d2, "D")):
        for p, leaf in jax.tree_util.tree_leaves_with_path(state.params):
            a = np.asarray(leaf)
            if a.dtype.kind == "f":
                assert np.isfinite(a).all(), \
                    f"{name} param NaN at {jax.tree_util.keystr(p)}"


def test_checkpoint_migrates_old_dense_scope(tmp_path):
    """Checkpoints written when TorchLinear wrapped nn.Dense (params nested
    under a Dense_0 scope) must still load after the direct-param change."""
    import pickle

    from gantts_tpu.train.checkpoint import load_checkpoint

    old_params = {
        "H_0": {"Dense_0": {"kernel": np.ones((3, 4)), "bias": np.zeros(4)}},
        "last_linear": {"Dense_0": {"kernel": np.ones((4, 2)),
                                    "bias": np.zeros(2)}},
    }
    # optax-style optimizer state mirroring the old tree
    old_opt = ({"mu": {"H_0": {"Dense_0": {"kernel": np.zeros((3, 4)),
                                           "bias": np.zeros(4)}}}},)
    path = str(tmp_path / "checkpoint_epoch1_Generator.pth")
    with open(path, "wb") as f:
        pickle.dump({"state_dict": old_params, "optimizer": old_opt,
                     "global_epoch": 1}, f)

    params, opt, epoch = load_checkpoint(path)
    assert epoch == 1
    assert set(params["H_0"].keys()) == {"kernel", "bias"}
    assert set(params["last_linear"].keys()) == {"kernel", "bias"}
    assert params["H_0"]["kernel"].shape == (3, 4)
    assert set(opt[0]["mu"]["H_0"].keys()) == {"kernel", "bias"}


def test_checkpoint_msgpack_roundtrip_not_pickle(tmp_path):
    """New checkpoints are msgpack (no code execution on load); the optax
    namedtuple structure is re-imposed from a fresh opt_state template."""
    import jax
    import optax

    from gantts_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from gantts_tpu.train.step import TrainState

    params = {"H_0": {"kernel": np.full((3, 4), 0.5, np.float32),
                      "bias": np.zeros(4, np.float32)}}
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    state = TrainState(params=params, opt_state=opt_state)
    path = save_checkpoint(state, 7, str(tmp_path), "Generator")
    assert path.endswith("checkpoint_epoch7_Generator.pth")

    with open(path, "rb") as f:
        head = f.read(2)
    assert not (head[0] == 0x80 and head[1] <= 5), "payload is a pickle"

    params2, opt2, epoch = load_checkpoint(path, opt_template=tx.init(params))
    assert epoch == 7
    np.testing.assert_array_equal(params2["H_0"]["kernel"],
                                  params["H_0"]["kernel"])
    # structure restored: usable directly by tx.update
    grads = jax.tree_util.tree_map(np.ones_like, params)
    updates, _ = tx.update(grads, opt2, params2)
    assert jax.tree_util.tree_structure(updates) == \
        jax.tree_util.tree_structure(params)

    # params-only consumers (eval scripts) need no template
    params3, opt3, _ = load_checkpoint(path)
    np.testing.assert_array_equal(params3["H_0"]["bias"],
                                  params["H_0"]["bias"])


def test_adv_weight_zero_adv_loss_is_clipped_not_crash():
    """A saturated D makes E(adv) exactly 0.0 (-log(1.0) in f32); the
    dynamic weight must hit the reference's clip endpoint (w_d * 1e3), not
    raise ZeroDivisionError (found by the quality-dossier curriculum run)."""
    from gantts_tpu.train.loop import adv_weight

    assert adv_weight(1.0, 0.5, 0.0) == 1000.0
    assert adv_weight(0.5, 0.5, 0.0) == 500.0
    assert abs(adv_weight(1.0, 2.0, 4.0) - 0.5) < 1e-12
    assert adv_weight(1.0, 0.0, 0.0) == 0.0


@pytest.mark.parametrize("scan_form", [False, True])
def test_multi_step_fn_matches_sequential(scan_form, monkeypatch):
    """The fused K-steps-per-dispatch driver (GanTrainer.multi_step_fn)
    must be step-for-step identical to K sequential step_fn calls: same
    updated params, same per-step scalars, same chained dropout key.
    Both program forms are pinned: the default straight-line unroll
    (XLA aliases the G/D/optimizer state in place) and the
    GANTTS_TPU_MULTISTEP_SCAN=1 lax.scan fallback (K x smaller program
    for axon's remote-compile size limit)."""
    if scan_form:
        monkeypatch.setenv("GANTTS_TPU_MULTISTEP_SCAN", "1")
    else:
        monkeypatch.delenv("GANTTS_TPU_MULTISTEP_SCAN", raising=False)
    import jax
    import jax.numpy as jnp

    from gantts_tpu.core.windows import unit_variance_mlpg_matrix
    from gantts_tpu.train import GanTrainer, StepConfig
    from gantts_tpu.train.setup import init_models_and_states

    hp = _small_vc_hp()
    hp.generator_params.update(in_dim=57, out_dim=57)
    hp.discriminator_params.update(in_dim=19)
    K, B, T = 3, 4, 32
    rs = np.random.RandomState(3)
    xs = rs.rand(K, B, T, 57).astype(np.float32)
    ys = rs.rand(K, B, T, 57).astype(np.float32)
    ls = np.tile(np.array([20, 32, 17, 32], np.int32), (K, 1))
    R = jnp.asarray(unit_variance_mlpg_matrix(hp.windows, T))
    cfg = StepConfig.from_hparams(hp, w_d=0.7, mse_w=0.0, mge_w=1.0,
                                  update_d=True, update_g=True)
    Y_mean = np.zeros(57, np.float32)
    Y_std = np.ones(57, np.float32)
    adv_w = jnp.float32(0.7)
    rng0 = jax.random.key(11, impl="rbg")

    # sequential (donating: re-init for the fused run below)
    model_g, model_d, tx_g, tx_d, gs, ds = init_models_and_states(hp)
    tr = GanTrainer(model_g, model_d, tx_g, tx_d, cfg, Y_mean, Y_std)
    step = tr.step_fn(True)
    rng = rng0
    seq_outs = []
    for i in range(K):
        gs, ds, out, rng = step(gs, ds, None, jnp.asarray(xs[i]),
                                jnp.asarray(ys[i]), jnp.asarray(ls[i]),
                                R, None, adv_w, rng)
        seq_outs.append(jax.device_get(out))

    model_g, model_d, tx_g, tx_d, gs2, ds2 = init_models_and_states(hp)
    tr2 = GanTrainer(model_g, model_d, tx_g, tx_d, cfg, Y_mean, Y_std)
    gs2, ds2, outs, rng2 = tr2.multi_step_fn(True)(
        gs2, ds2, None, jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ls),
        R, None, adv_w, rng0)
    outs = jax.device_get(outs)

    for k in seq_outs[0]:
        fused_k = np.asarray(outs[k])
        assert fused_k.shape[0] == K, (k, fused_k.shape)
        for i in range(K):
            assert np.allclose(float(seq_outs[i][k]), fused_k[i],
                               rtol=1e-5, atol=1e-6), (k, i)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(gs.params)),
                    jax.tree_util.tree_leaves(jax.device_get(gs2.params))):
        assert np.allclose(a, b, atol=1e-6), np.abs(a - b).max()
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(ds.params)),
                    jax.tree_util.tree_leaves(jax.device_get(ds2.params))):
        assert np.allclose(a, b, atol=1e-6), np.abs(a - b).max()
    np.testing.assert_array_equal(np.asarray(jax.random.key_data(rng)),
                                  np.asarray(jax.random.key_data(rng2)))


def test_train_loop_steps_per_dispatch_identical(vc_corpus):
    """train_loop with steps_per_dispatch>1 (fused groups + single-step
    remainders) must log the exact same scalar series as the unfused
    loop — the fused driver is a dispatch-count optimization only."""
    hp = _small_vc_hp()
    _, _, rows1 = _run_vc(vc_corpus, hp, w_d=0.7)
    hp = _small_vc_hp()
    _, _, rows2 = _run_vc(vc_corpus, hp, w_d=0.7, steps_per_dispatch=2)
    assert [r[0] for r in rows1] == [r[0] for r in rows2]
    for (n1, v1, s1), (n2, v2, s2) in zip(rows1, rows2):
        if "per_sec" in n1 or "seconds" in n1:
            continue  # wall-clock series legitimately differ
        assert np.isclose(v1, v2, rtol=1e-5, atol=1e-7), (n1, v1, v2)


def test_multi_step_rejected_program_falls_back_to_scan(monkeypatch):
    """If the unrolled K-step program fails on its FIRST dispatch (axon
    rejects large programs at remote-compile time, HTTP 413), train_loop
    must retry with the K-x-smaller lax.scan form and finish the epoch —
    and remember that choice for later phases instead of re-attempting
    the failing compile."""
    import jax
    from gantts_tpu.train import GanTrainer, StepConfig
    from gantts_tpu.train.loop import train_loop
    from gantts_tpu.train.setup import init_models_and_states

    monkeypatch.delenv("GANTTS_TPU_MULTISTEP_SCAN", raising=False)
    hp = _small_vc_hp()
    hp.nepoch = 1
    hp.generator_params.update(in_dim=57, out_dim=57)
    hp.discriminator_params.update(in_dim=19)
    cfg = StepConfig.from_hparams(hp, w_d=0.0, mse_w=0.0, mge_w=1.0,
                                  update_d=False, update_g=True)
    model_g, model_d, tx_g, tx_d, gs, ds = init_models_and_states(hp)
    tr = GanTrainer(model_g, model_d, tx_g, tx_d, cfg,
                    np.zeros(57, np.float32), np.ones(57, np.float32),
                    windows=hp.windows)

    forms_requested = []
    real = tr.multi_step_fn

    def fake_multi_step_fn(train, form=None):
        forms_requested.append(form)
        if form != "scan":
            def rejected(*a, **k):
                raise RuntimeError("remote compile: HTTP 413 payload "
                                   "too large (simulated)")
            return rejected
        return real(train, form=form)

    monkeypatch.setattr(tr, "multi_step_fn", fake_multi_step_fn)

    rs = np.random.RandomState(0)
    B, T = 4, 32

    def batch():
        return (rs.rand(B, T, 57).astype(np.float32),
                rs.rand(B, T, 57).astype(np.float32),
                np.array([20, 32, 17, 32], np.int32))

    loaders = {"train": [batch(), batch()], "test": [batch(), batch()]}
    gs, ds, _ = train_loop(tr, gs, ds, None, loaders, hp, w_d=0.0,
                           mse_w=0.0, mge_w=1.0, update_d=False,
                           update_g=True, checkpoint_dir=None, writer=None,
                           steps_per_dispatch=2)
    # first phase asked for the default (None), fell back to scan; the
    # second phase must start directly on scan (no repeated rejection)
    assert forms_requested[0] is None
    assert "scan" in forms_requested
    assert forms_requested[-1] == "scan"
    leaves = jax.tree_util.tree_leaves(jax.device_get(gs.params))
    assert all(np.isfinite(leaf).all() for leaf in leaves)


def test_multi_step_second_shape_rejection_falls_back(monkeypatch):
    """jit recompiles the fused program per bucket shape, so axon can
    reject a NEW shape mid-phase AFTER another shape's program already
    ran; the fallback must be per compiled shape, not
    first-dispatch-only (round-5 review finding)."""
    import jax
    from gantts_tpu.train import GanTrainer, StepConfig
    from gantts_tpu.train.loop import train_loop
    from gantts_tpu.train.setup import init_models_and_states

    monkeypatch.delenv("GANTTS_TPU_MULTISTEP_SCAN", raising=False)
    hp = _small_vc_hp()
    hp.nepoch = 1
    hp.generator_params.update(in_dim=57, out_dim=57)
    hp.discriminator_params.update(in_dim=19)
    cfg = StepConfig.from_hparams(hp, w_d=0.0, mse_w=0.0, mge_w=1.0,
                                  update_d=False, update_g=True)
    model_g, model_d, tx_g, tx_d, gs, ds = init_models_and_states(hp)
    tr = GanTrainer(model_g, model_d, tx_g, tx_d, cfg,
                    np.zeros(57, np.float32), np.ones(57, np.float32),
                    windows=hp.windows)

    real = tr.multi_step_fn
    rejected_shapes = []

    def fake_multi_step_fn(train, form=None):
        fn = real(train, form=form)
        if form == "scan":
            return fn

        def maybe(gstate, dstate, ref, xs, *rest):
            # the T=48 bucket's unrolled program is "too large"; the
            # T=32 bucket's compiles and runs fine
            if xs.shape[2] == 48:
                rejected_shapes.append(xs.shape)
                raise RuntimeError("remote compile: HTTP 413 payload "
                                   "too large (simulated)")
            return fn(gstate, dstate, ref, xs, *rest)

        return maybe

    monkeypatch.setattr(tr, "multi_step_fn", fake_multi_step_fn)

    rs = np.random.RandomState(0)

    def batch(T):
        return (rs.rand(4, T, 57).astype(np.float32),
                rs.rand(4, T, 57).astype(np.float32),
                np.array([T - 12, T, T - 15, T], np.int32))

    # two fused chunks of the short bucket first (the unrolled program
    # RUNS), then the long bucket whose unrolled compile is rejected
    loaders = {"train": [batch(32), batch(32), batch(48), batch(48)],
               "test": [batch(32), batch(32)]}
    gs, ds, _ = train_loop(tr, gs, ds, None, loaders, hp, w_d=0.0,
                           mse_w=0.0, mge_w=1.0, update_d=False,
                           update_g=True, checkpoint_dir=None, writer=None,
                           steps_per_dispatch=2)
    assert len(rejected_shapes) == 1  # fell back, did not re-attempt
    leaves = jax.tree_util.tree_leaves(jax.device_get(gs.params))
    assert all(np.isfinite(leaf).all() for leaf in leaves)
