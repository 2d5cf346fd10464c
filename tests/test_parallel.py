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
    g1, d1, out1, _ = tr1.step_fn(True)(
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
    g8, d8, out8, _ = tr8.step_fn(True)(
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


def test_train_cli_uses_mesh_and_matches_single_device(tmp_path):
    """VERDICT round-1 item: DP must be reachable from the user-facing CLI.
    Run train.py on the same synthetic corpus with --num-devices=1 and with
    the full 8-device CPU mesh; the logged scalar series must agree."""
    import json
    import os
    import subprocess
    import sys
    from os.path import dirname, join

    REPO = dirname(dirname(os.path.abspath(__file__)))
    sys.path.insert(0, REPO)
    from tests.make_synthetic_data import make_vc

    corpus = str(tmp_path / "corpus")
    make_vc(corpus, num=16, order=19)

    hp = ("nepoch=2,batch_size=4,order=19,stream_sizes=[57],"
          "generator_params={'in_dim': None, 'out_dim': None,"
          " 'num_hidden': 1, 'hidden_dim': 16, 'static_dim': 19,"
          " 'dropout': 0.0},"
          "discriminator_params={'in_dim': 19, 'out_dim': 1,"
          " 'num_hidden': 1, 'hidden_dim': 8, 'dropout': 0.0,"
          " 'last_sigmoid': True}")

    def run(tag, extra):
        log = str(tmp_path / f"log_{tag}")
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   GANTTS_TPU_PLATFORM="cpu")
        r = subprocess.run(
            [sys.executable, join(REPO, "train.py"),
             join(corpus, "X"), join(corpus, "Y"), "--hparams_name=vc",
             f"--hparams={hp}", "--w_d=1.0",
             f"--checkpoint-dir={tmp_path / ('ck_' + tag)}",
             f"--log-event-path={log}"] + extra,
            capture_output=True, text=True, cwd=REPO, env=env, timeout=900)
        assert r.returncode == 0, r.stderr[-3000:]
        series = {}
        with open(join(log, "scalars.jsonl")) as f:
            for line in f:
                row = json.loads(line)
                series[(row["tag"], row["step"])] = row["value"]
        return r.stdout, series

    out1, s1 = run("single", ["--num-devices=1"])
    out8, s8 = run("mesh", [])
    assert "Data-parallel over 8 devices" in out8
    assert "Data-parallel" not in out1

    assert set(s1) == set(s8)
    for key in s1:
        tag = key[0]
        if "per_sec" in tag or "seconds" in tag:
            continue  # wall-clock series legitimately differ
        a, b = s1[key], s8[key]
        assert abs(a - b) <= 2e-4 * max(1.0, abs(a)), (key, a, b)


def test_time_sharded_mlpg_matches_dense():
    """Sequence parallelism (SURVEY section 2.4 long-context story): MLPG
    with the TIME axis sharded over 8 devices (halo exchange via ppermute)
    must match the dense unsharded computation exactly."""
    from gantts_tpu.parallel import time_sharded_unit_variance_mlpg
    from gantts_tpu.core.paramgen import unit_variance_mlpg

    windows = hparams.vc.windows
    B, T, S = 2, 512, 5
    rs = np.random.RandomState(0)
    u = rs.randn(B, T, 3 * S).astype(np.float32)

    R = jnp.asarray(unit_variance_mlpg_matrix(windows, T))
    y_dense = np.asarray(unit_variance_mlpg(R, jnp.asarray(u)))

    mesh = make_mesh(8)
    u_sharded = jax.device_put(
        u, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(
            None, "data", None)))
    fn = jax.jit(lambda m: time_sharded_unit_variance_mlpg(
        m, windows, mesh))
    y_sp = np.asarray(fn(u_sharded))

    assert y_sp.shape == y_dense.shape
    assert np.abs(y_sp - y_dense).max() < 5e-5, np.abs(y_sp - y_dense).max()

    # must also hold at a length where dense R is already impractical
    T2 = 2048
    u2 = rs.randn(1, T2, 3 * S).astype(np.float32)
    from gantts_tpu.core.fast_mlpg import unit_variance_mlpg_stencil

    y_ref = np.asarray(unit_variance_mlpg_stencil(jnp.asarray(u2), windows))
    u2_sh = jax.device_put(
        u2, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(
            None, "data", None)))
    y2 = np.asarray(jax.jit(lambda m: time_sharded_unit_variance_mlpg(
        m, windows, mesh))(u2_sh))
    assert np.abs(y2 - y_ref).max() < 5e-5


# Parametric multi-host cluster program: argv = pid, port, repo, nprocs,
# nsteps, save_dir ('' = no save), resume_dir ('' = fresh init).  Runs
# ``nsteps`` chained GAN steps on the identical global batch with
# per-step rng PRNGKey(7 + i); optionally resumes from / saves the
# checkpoint-name-contract files (proc-0-only write inside
# save_checkpoint), and prints the final step's scalars.
_MULTIHOST_PROG = r'''
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
pid, port, repo, nprocs, nsteps, save_dir, resume_dir, step0 = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4]),
    int(sys.argv[5]), sys.argv[6], sys.argv[7], int(sys.argv[8]))
jax.distributed.initialize(coordinator_address="127.0.0.1:%d" % port,
                           num_processes=nprocs, process_id=pid)
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, repo)
from gantts_tpu import hparams
from gantts_tpu.core.windows import unit_variance_mlpg_matrix
from gantts_tpu.parallel import DataParallelGanTrainer, make_mesh
from gantts_tpu.train import StepConfig, TrainState
from gantts_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from gantts_tpu.train.setup import init_models_and_states

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
if resume_dir:
    # DP resume handoff: every process loads the proc-0-written files; the
    # fresh opt_states are the structure templates (msgpack flattens optax)
    pg, og, _ = load_checkpoint(
        os.path.join(resume_dir, "checkpoint_epoch1_Generator.pth"),
        opt_template=gstate.opt_state)
    pd_, od, _ = load_checkpoint(
        os.path.join(resume_dir, "checkpoint_epoch1_Discriminator.pth"),
        opt_template=dstate.opt_state)
    gstate = TrainState(params=pg, opt_state=og)
    dstate = TrainState(params=pd_, opt_state=od)
mesh = make_mesh()  # all 2*nprocs global devices
assert mesh.devices.size == 2 * nprocs, mesh.devices.size
tr = DataParallelGanTrainer(model_g, model_d, tx_g, tx_d, cfg,
                            np.zeros(27, np.float32), np.ones(27, np.float32),
                            mesh=mesh)
gstate, dstate = tr.place_states(gstate, dstate)

# IDENTICAL global batch on every process (the loader contract); batch is
# sized so every 2-device host holds exactly B / (2 * nprocs) rows
B, T = 8, 64
rs = np.random.RandomState(0)
x = rs.rand(B, T, 27).astype(np.float32)
y = rs.rand(B, T, 27).astype(np.float32)
lengths = np.r_[rs.randint(T // 2, T, B - 1), T].astype(np.int32)
xs, ys, ls, _ = tr.put_batch(x, y, lengths)
R = tr.put_replicated(np.asarray(unit_variance_mlpg_matrix(hp.windows, T),
                                 np.float32))
step = tr.step_fn(True)
for i in range(nsteps):
    gstate, dstate, out, _ = step(
        gstate, dstate, None, xs, ys, ls, R, None, jnp.float32(0.7),
        jax.random.PRNGKey(7 + step0 + i))
if save_dir:
    save_checkpoint(gstate, 1, save_dir, "Generator")
    save_checkpoint(dstate, 1, save_dir, "Discriminator")
out = {k: float(v) for k, v in jax.device_get(out).items()}
print("RESULT" + json.dumps(out, sort_keys=True), flush=True)
'''


def _communicate_all(procs, timeout=600):
    """communicate() every process; on a HANG (the most common
    distributed-flake mode — a coordinator that never comes up — which
    raises TimeoutExpired rather than exiting nonzero) kill the whole
    cluster and return None so the caller's retry loop treats it like a
    crash instead of erroring out and leaking the sibling children."""
    import subprocess

    texts = []
    hung = False
    for p in procs:
        try:
            texts.append(p.communicate(timeout=timeout)[0])
        except subprocess.TimeoutExpired:
            hung = True
            break
    if hung:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
        return None
    return texts


def _run_cluster(nprocs, nsteps=1, save_dir="", resume_dir="", step0=0,
                 retries=3):
    """Launch an nprocs-process CPU Gloo cluster of _MULTIHOST_PROG and
    return each process's RESULT dict."""
    import json
    import os
    import socket
    import subprocess
    import sys
    from os.path import dirname

    REPO = dirname(dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)

    def attempt():
        # free-port probe is inherently racy (closed before the coordinator
        # binds it) — retried with a fresh port on failure
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        procs = [subprocess.Popen(
            [sys.executable, "-c", _MULTIHOST_PROG, str(i), str(port), REPO,
             str(nprocs), str(nsteps), save_dir, resume_dir, str(step0)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO, env=env) for i in range(nprocs)]
        texts = _communicate_all(procs)
        if texts is None or any(p.returncode != 0 for p in procs):
            return None, texts or ["<cluster hang: coordinator never "
                                   "came up or a process deadlocked>"]
        return texts, texts

    for _ in range(retries):
        texts, raw = attempt()
        if texts is not None:
            break
    assert texts is not None, "".join(t[-2000:] for t in raw)
    outs = []
    for out in texts:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        assert line, out[-2000:]
        outs.append(json.loads(line[-1][len("RESULT"):]))
    return outs


def _inprocess_reference(n_devices, nsteps):
    """The same workload on an in-process n_devices mesh (same data, same
    rng key sequence, uninterrupted) — the cross-check target for the
    cluster runs, including the save/resume continuity check."""
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
    mesh = make_mesh(n_devices)
    tr = DataParallelGanTrainer(model_g, model_d, tx_g, tx_d, cfg,
                                np.zeros(27, np.float32),
                                np.ones(27, np.float32), mesh=mesh)
    gstate, dstate = tr.place_states(gstate, dstate)
    B, T = 8, 64
    rs = np.random.RandomState(0)
    x = rs.rand(B, T, 27).astype(np.float32)
    y = rs.rand(B, T, 27).astype(np.float32)
    lengths = np.r_[rs.randint(T // 2, T, B - 1), T].astype(np.int32)
    xs, ys, ls, _ = tr.put_batch(x, y, lengths)
    R = tr.put_replicated(np.asarray(
        unit_variance_mlpg_matrix(hp.windows, T), np.float32))
    step = tr.step_fn(True)
    for i in range(nsteps):
        gstate, dstate, out, _ = step(
            gstate, dstate, None, xs, ys, ls, R, None, jnp.float32(0.7),
            jax.random.PRNGKey(7 + i))
    return {k: float(v) for k, v in jax.device_get(out).items()}


def _assert_cluster_agrees(outs, ref=None, rtol=2e-4):
    for o in outs[1:]:
        assert outs[0].keys() == o.keys()
        for k in outs[0]:
            assert np.isfinite(outs[0][k]), (k, outs[0])
            assert np.isclose(outs[0][k], o[k], rtol=1e-6), \
                (k, outs[0][k], o[k])
    if ref is not None:
        for k, v in ref.items():
            assert np.isclose(outs[0][k], v, rtol=rtol, atol=1e-5), \
                (k, outs[0][k], v)


def test_multihost_two_process_cpu_cluster():
    """REAL multi-host DP: two OS processes form a jax.distributed CPU
    cluster (2 local devices each, Gloo collectives); both feed the
    identical global batch through put_batch/place_states and must agree
    on every step scalar — and match the in-process single-mesh step."""
    outs = _run_cluster(nprocs=2, nsteps=1)
    _assert_cluster_agrees(outs, _inprocess_reference(4, 1))


def test_multihost_four_process_cpu_cluster():
    """Same contract at 4 processes x 2 devices (8-way DP): the
    identical-global-batch / addressable-shard placement is exactly what
    breaks at larger process counts (each host now owns a 1-row shard of
    the 8-row batch), so the agreement must hold beyond the 2-process
    case."""
    outs = _run_cluster(nprocs=4, nsteps=1)
    assert len(outs) == 4
    _assert_cluster_agrees(outs, _inprocess_reference(8, 1))


def test_multihost_checkpoint_handoff(tmp_path):
    """DP save-on-proc-0 -> fresh-cluster resume continuity: train 3 steps
    on a 2-process cluster, write the contract-named checkpoints (proc 0
    only), resume a BRAND NEW 2-process cluster from them, take step 4,
    and require its scalars to match an uninterrupted in-process 4-step
    run bit-for-tolerance (same data, same rng key sequence)."""
    ck = str(tmp_path)
    outs_a = _run_cluster(nprocs=2, nsteps=3, save_dir=ck)
    _assert_cluster_agrees(outs_a)
    import os
    for name in ("Generator", "Discriminator"):
        assert os.path.exists(
            os.path.join(ck, f"checkpoint_epoch1_{name}.pth")), name
    outs_b = _run_cluster(nprocs=2, nsteps=1, resume_dir=ck, step0=3)
    _assert_cluster_agrees(outs_b, _inprocess_reference(4, 4))


# Multi-host TRAIN-LOOP program (round-5 VERDICT item 6): drives the real
# ``train_loop`` (not raw step calls) on a recurrent SRU generator over a
# MIXED-SHAPE batch sequence — T=64, T=96, T=64 — so the per-shape jit
# cache, the R-matrix bucket cache, and the epoch/adv-weight host state are
# all exercised across processes.  argv = pid, port, repo, nprocs.
_MULTIHOST_LOOP_PROG = r'''
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
pid, port, repo, nprocs = (int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
                           int(sys.argv[4]))
jax.distributed.initialize(coordinator_address="127.0.0.1:%d" % port,
                           num_processes=nprocs, process_id=pid)
import numpy as np
sys.path.insert(0, repo)
from tests.test_parallel import _loop_workload
out = _loop_workload(mesh_devices=None)
print("RESULT" + json.dumps(out, sort_keys=True), flush=True)
'''


def _loop_workload(mesh_devices):
    """Shared train_loop workload: recurrent SRU generator, 2 epochs over a
    mixed-shape 3-batch train loader (+1 test batch).  ``mesh_devices``
    sizes an in-process mesh; None = all global devices (cluster mode).
    Returns per-leaf parameter means of both final states (the strongest
    cross-process / cross-topology parity signal)."""
    from gantts_tpu.train.loop import train_loop

    hp = hparams.tts_acoustic.copy()
    hp.nepoch = 2
    hp.generator_params.update(
        in_dim=30, out_dim=187, num_hidden=1, hidden_dim=16,
        bidirectional=True, dropout=0.0, use_relu=1, rnn_dropout=0.0,
        last_sigmoid=False)
    hp.discriminator_params.update(in_dim=58 + 30, num_hidden=1,
                                   hidden_dim=8, dropout=0.0)
    model_g, model_d, tx_g, tx_d, gstate, dstate = init_models_and_states(hp)
    cfg = StepConfig.from_hparams(hp, w_d=1.0, mse_w=0.0, mge_w=1.0,
                                  update_d=True, update_g=True)
    mesh = make_mesh(mesh_devices)
    tr = DataParallelGanTrainer(model_g, model_d, tx_g, tx_d, cfg,
                                np.zeros(187, np.float32),
                                np.ones(187, np.float32), mesh=mesh)

    rs = np.random.RandomState(0)

    def batch(T):
        x = rs.rand(8, T, 30).astype(np.float32)
        y = rs.rand(8, T, 187).astype(np.float32)
        lengths = np.r_[rs.randint(T // 2, T, 7), T].astype(np.int32)
        return x, y, lengths

    # identical global batch sequence on every process (the DP loader
    # contract, CLAUDE.md): two bucket lengths, revisited out of order
    loaders = {"train": [batch(64), batch(96), batch(64)],
               "test": [batch(64)]}
    gstate, dstate, _ = train_loop(
        tr, gstate, dstate, None, loaders, hp, w_d=1.0, mse_w=0.0,
        mge_w=1.0, update_d=True, update_g=True, checkpoint_dir=None,
        writer=None, seed=1234)
    out = {}
    for tag, st in (("g", gstate), ("d", dstate)):
        leaves = jax.tree_util.tree_leaves(jax.device_get(st.params))
        for i, leaf in enumerate(leaves):
            out[f"{tag}{i}"] = float(np.mean(np.asarray(leaf, np.float64)))
    return out


def test_multihost_train_loop_mixed_shapes():
    """REAL multi-host DP through the actual train_loop over a mixed-shape
    batch sequence: both cluster processes must agree on every final
    parameter leaf AND match the same workload run on an in-process
    4-device mesh (per-shape jit cache + R bucket cache + epoch state all
    live, recurrent scan generator)."""
    import json
    import os
    import socket
    import subprocess
    import sys
    from os.path import dirname

    REPO = dirname(dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)

    def attempt():
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        procs = [subprocess.Popen(
            [sys.executable, "-c", _MULTIHOST_LOOP_PROG, str(i), str(port),
             REPO, "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO, env=env) for i in range(2)]
        texts = _communicate_all(procs)
        if texts is None or any(p.returncode != 0 for p in procs):
            return None, texts or ["<cluster hang: coordinator never "
                                   "came up or a process deadlocked>"]
        return texts, texts

    for _ in range(3):
        texts, raw = attempt()
        if texts is not None:
            break
    assert texts is not None, "".join(t[-2000:] for t in raw)
    outs = []
    for out in texts:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        assert line, out[-2000:]
        outs.append(json.loads(line[-1][len("RESULT"):]))

    # cross-process agreement (replicated params must be identical)
    assert outs[0].keys() == outs[1].keys()
    for k in outs[0]:
        assert np.isfinite(outs[0][k]), (k, outs[0][k])
        assert np.isclose(outs[0][k], outs[1][k], rtol=1e-6), \
            (k, outs[0][k], outs[1][k])

    # cross-topology agreement with the uninterrupted in-process run
    ref = _loop_workload(mesh_devices=4)
    assert ref.keys() == outs[0].keys()
    for k in ref:
        assert np.isclose(outs[0][k], ref[k], rtol=5e-4, atol=1e-6), \
            (k, outs[0][k], ref[k])


def test_dp_step_with_pallas_kernels_matches_fallback(monkeypatch):
    """The sharded GAN step must trace/compile/run with the fused Pallas
    kernels active (interpret mode on the CPU mesh) and reproduce the scan
    fallback's scalars — pins that an Auto-axis mesh accepts the Mosaic
    call and that sharding does not perturb the kernel numerics."""
    from gantts_tpu import kernels

    hp = hparams.tts_acoustic.copy()
    hp.generator_params.update(
        in_dim=30, out_dim=187, num_hidden=1, hidden_dim=16,
        bidirectional=True, dropout=0.0, use_relu=1, rnn_dropout=0.0,
        last_sigmoid=False)
    hp.discriminator_params.update(in_dim=58 + 30, num_hidden=1,
                                   hidden_dim=8, dropout=0.0)
    cfg = StepConfig.from_hparams(hp, w_d=1.0, mse_w=0.0, mge_w=1.0,
                                  update_d=True, update_g=True)
    B, T = 8, 64
    rs = np.random.RandomState(0)
    x = rs.rand(B, T, 30).astype(np.float32)
    y = rs.rand(B, T, 187).astype(np.float32)
    lengths = np.r_[rs.randint(T // 2, T, B - 1), T].astype(np.int32)
    R = np.asarray(unit_variance_mlpg_matrix(hp.windows, T), np.float32)
    mesh = make_mesh(8)

    def run():
        model_g, model_d, tx_g, tx_d, gstate, dstate = \
            init_models_and_states(hp)
        tr = DataParallelGanTrainer(
            model_g, model_d, tx_g, tx_d, cfg, np.zeros(187, np.float32),
            np.ones(187, np.float32), mesh=mesh)
        gstate, dstate = tr.place_states(gstate, dstate)
        xs, ys, ls, _ = tr.put_batch(x, y, lengths)
        Rr = tr.put_replicated(R)
        _, _, out, _ = tr.step_fn(True)(
            gstate, dstate, None, xs, ys, ls, Rr, None,
            jnp.float32(0.7), jax.random.PRNGKey(7))
        return {k: float(v) for k, v in jax.device_get(out).items()}

    monkeypatch.setattr(kernels, "default_use_pallas", lambda: True)
    out_k = run()
    monkeypatch.setattr(kernels, "default_use_pallas", lambda: False)
    out_s = run()
    for k in out_s:
        # f0_rmse is NaN/NaN on random data (no voiced frames) — equal_nan
        assert np.isclose(out_k[k], out_s[k], rtol=5e-4, atol=1e-4,
                          equal_nan=True), (k, out_k[k], out_s[k])
    assert np.isfinite(out_s["generator"]) and np.isfinite(out_s["mge"])
