"""Data-contract hardening: the split is the load-bearing agreement between
training and evaluation (SURVEY.md section 1: eval re-derives the exact
train-time split), and training must be reproducible under a fixed seed."""

import os
import sys
from os.path import dirname, join

import numpy as np
import pytest

REPO = dirname(dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gantts_tpu.data import BatchIterator, NPYDataSource  # noqa: E402


@pytest.fixture(scope="module")
def npy_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("npys"))
    rs = np.random.RandomState(0)
    for i in range(23):
        np.save(join(d, f"utt_{i:03d}.npy"),
                rs.randn(10 + i, 4).astype(np.float32))
    # decoys the discovery must ignore
    open(join(d, "notes.txt"), "w").write("x")
    np.save(join(d, "stats_mean.npy"), np.zeros(4))  # .npy but sorts first
    return d


def test_split_partition_and_stability(npy_dir):
    """train ∪ val ∪ test partitions the sorted files; re-derivation is
    bit-stable (what evaluation_{vc,tts}.py rely on)."""
    train = NPYDataSource(npy_dir, train=True).collect_files()
    val = NPYDataSource(npy_dir, train=False).collect_files()
    test = NPYDataSource(npy_dir, test=True).collect_files()

    assert len(test) == 5  # last-5 contract (reference train.py:82-84)
    all_files = sorted(train + val + test)
    expected = sorted(
        join(npy_dir, f) for f in os.listdir(npy_dir) if f.endswith(".npy"))
    assert all_files == expected
    assert not (set(train) & set(val))
    assert not (set(train) & set(test))
    assert not (set(val) & set(test))
    # the held-out test set is literally the 5 lexicographically-last files
    assert test == expected[-5:]

    # bit-stable across calls (fresh instances)
    assert NPYDataSource(npy_dir, train=True).collect_files() == train
    assert NPYDataSource(npy_dir, train=False).collect_files() == val

    # max_files truncates before the train/val split, after test removal
    t2 = NPYDataSource(npy_dir, train=True, max_files=10).collect_files()
    v2 = NPYDataSource(npy_dir, train=False, max_files=10).collect_files()
    assert len(t2) + len(v2) == 10


def test_batch_iterator_reproducible():
    data = [(np.full((5 + i, 2), i, np.float32),
             np.full((5 + i, 2), -i, np.float32)) for i in range(9)]
    a = BatchIterator(data, batch_size=4, shuffle=True, seed=7,
                      bucket_multiple=8)
    b = BatchIterator(data, batch_size=4, shuffle=True, seed=7,
                      bucket_multiple=8)
    for (xa, ya, la), (xb, yb, lb) in zip(a, b):
        assert np.array_equal(xa, xb) and np.array_equal(la, lb)
    # epoch 2 differs from epoch 1 (shuffling advances with the epoch)
    first_epoch_sig = None
    it = BatchIterator(data, batch_size=4, shuffle=True, seed=7,
                       bucket_multiple=8)
    e1 = [l.copy() for _, _, l in it]
    e2 = [l.copy() for _, _, l in it]
    assert not all(np.array_equal(a, b) for a, b in zip(e1, e2))


def test_batch_iterator_prefetch_matches_synchronous():
    """num_workers prefetching must produce the IDENTICAL batch sequence
    (multi-host DP relies on every process seeing the same batches), and
    cache_size memoization must not change values."""
    data = [(np.full((5 + i, 2), i, np.float32),
             np.full((5 + i, 2), -i, np.float32)) for i in range(13)]
    sync = BatchIterator(data, batch_size=4, shuffle=True, seed=7,
                         bucket_multiple=8)
    pre = BatchIterator(data, batch_size=4, shuffle=True, seed=7,
                        bucket_multiple=8, num_workers=3, cache_size=6)
    for epoch in range(3):  # cache warm-up then steady state
        batches_s = list(sync)
        batches_p = list(pre)
        assert len(batches_s) == len(batches_p)
        for (xs, ys, ls), (xp, yp, lp) in zip(batches_s, batches_p):
            assert np.array_equal(xs, xp)
            assert np.array_equal(ys, yp)
            assert np.array_equal(ls, lp)


def test_training_deterministic():
    """Two runs with identical seeds produce identical losses."""
    import jax
    import jax.numpy as jnp

    from gantts_tpu import hparams
    from gantts_tpu.core.windows import unit_variance_mlpg_matrix
    from gantts_tpu.train import GanTrainer, StepConfig
    from gantts_tpu.train.setup import init_models_and_states

    def run():
        hp = hparams.vc.copy()
        hp.order = 9
        hp.stream_sizes = [27]
        hp.generator_params.update(in_dim=27, out_dim=27, static_dim=9,
                                   num_hidden=1, hidden_dim=8)
        hp.discriminator_params.update(in_dim=9, num_hidden=1, hidden_dim=8)
        mg, md, tg, td, gs, ds = init_models_and_states(hp)
        cfg = StepConfig.from_hparams(hp, 1.0, 0.0, 1.0, True, True)
        tr = GanTrainer(mg, md, tg, td, cfg, np.zeros(9, np.float32),
                        np.ones(9, np.float32))
        rs = np.random.RandomState(3)
        x = jnp.asarray(rs.rand(2, 16, 27).astype(np.float32))
        y = jnp.asarray(rs.rand(2, 16, 27).astype(np.float32))
        l = jnp.asarray(np.array([12, 16], np.int32))
        R = jnp.asarray(unit_variance_mlpg_matrix(hp.windows, 16))
        step = tr.step_fn(True)
        outs = []
        rng = jax.random.PRNGKey(5)
        for i in range(3):
            rng, k = jax.random.split(rng)
            gs, ds, out, _ = step(gs, ds, None, x, y, l, R, None,
                               jnp.float32(1.0), k)
            outs.append(float(out["generator"]))
        return outs

    assert run() == run()
