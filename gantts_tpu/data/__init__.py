"""Host data pipeline: .npy discovery, deterministic splits, normalization,
bucketed batching.

Replaces the reference's nnmnkwii ``FileSourceDataset`` + torch ``DataLoader``
stack (train.py:71-159, 174-229) with a plain NumPy pipeline shaped for XLA:

  * ``NPYDataSource`` reproduces the reference split bit-for-bit: sorted
    ``*.npy``, the LAST 5 files are the held-out test set, the remainder is
    split train/val with sklearn ``train_test_split(test_size=0.112,
    random_state=1234)`` (train.py:64-65, 78-90) — eval scripts re-derive the
    same split, so this must never drift.
  * datasets normalize per item exactly like VCDataset / TTSDataset
    (train.py:96-136), including optional delta re-derivation after
    normalization.
  * ``BatchIterator`` pads each batch's time axis UP TO A BUCKET MULTIPLE
    (new, TPU-motivated): XLA compiles one program per shape, so padded
    lengths are quantized to keep the compilation count bounded, and the
    trailing partial batch is padded with zero-length rows instead of
    changing the batch dimension.  Masked losses make both paddings inert
    for every per-frame term.  One caveat: MLPG is a global banded solve,
    so zero-padding perturbs y_hat_static in the last few VALID frames of
    each utterance (the boundary response decays ~0.27x per frame; ~1e-2
    at the final frame).  The reference has the same approximation for
    every utterance shorter than its batch max (it pads to batch max,
    train.py:145-159); bucketing merely extends it to the batch-longest
    utterance.  Training is insensitive to it; EVALUATION is not, which is
    why eval paths use exact-length or dynamic-boundary MLPG
    (synthesis.py, core/fast_mlpg.MLPGStencil).
"""

from __future__ import annotations

import os
from os.path import join, splitext

import numpy as np
from sklearn.model_selection import train_test_split

TEST_SIZE = 0.112      # reference train.py:64
RANDOM_STATE = 1234    # reference train.py:65


class NPYDataSource:
    """Deterministic 3-way split over a directory of per-utterance .npy files
    (reference train.py:71-93)."""

    def __init__(self, dirname, train=True, max_files=None, test=False):
        self.dirname = dirname
        self.train = train
        self.test = test
        self.max_files = max_files

    def collect_files(self):
        npy_files = [f for f in os.listdir(self.dirname)
                     if splitext(f)[-1] == ".npy"]
        npy_files = sorted(join(self.dirname, f) for f in npy_files)
        # the final 5 files (sorted order) are the held-out eval set; the
        # remainder is split train/val below — both choices must stay
        # bit-identical to the reference pipeline (PARITY.md data row)
        if self.test:
            return npy_files[len(npy_files) - 5:]
        npy_files = npy_files[: len(npy_files) - 5]
        if self.max_files is not None and self.max_files > 0:
            npy_files = npy_files[: self.max_files]
        train_files, test_files = train_test_split(
            npy_files, test_size=TEST_SIZE, random_state=RANDOM_STATE)
        return train_files if self.train else test_files

    def load(self):
        return [np.load(f) for f in self.collect_files()]


class VCDataset:
    """Pooled z-score normalization of parallel X/Y (train.py:96-109)."""

    def __init__(self, X, Y, data_mean, data_std):
        self.X, self.Y = X, Y
        self.data_mean = data_mean
        self.data_std = data_std

    def __getitem__(self, idx):
        from gantts_tpu.preprocessing import scale

        x = scale(self.X[idx], self.data_mean, self.data_std)
        y = scale(self.Y[idx], self.data_mean, self.data_std)
        return x, y

    def __len__(self):
        return len(self.X)


class TTSDataset:
    """Min-max (0.01, 0.99) inputs + z-score outputs (train.py:112-136)."""

    def __init__(self, X, Y, X_data_min, X_data_max, Y_data_mean, Y_data_std,
                 recompute_deltas=False, windows=None, stream_sizes=None,
                 has_dynamic_features=None):
        from gantts_tpu.preprocessing import minmax_scale_params

        self.X, self.Y = X, Y
        self.X_data_min, self.X_data_scale = minmax_scale_params(
            X_data_min, X_data_max, feature_range=(0.01, 0.99))
        self.Y_data_mean = Y_data_mean
        self.Y_data_std = Y_data_std
        self.recompute_deltas = recompute_deltas
        self.windows = windows
        self.stream_sizes = stream_sizes
        self.has_dynamic_features = has_dynamic_features

    def __getitem__(self, idx):
        from gantts_tpu.preprocessing import minmax_scale, scale
        from gantts_tpu.core.streams import recompute_delta_features

        x = minmax_scale(self.X[idx], min_=self.X_data_min,
                         scale_=self.X_data_scale, feature_range=(0.01, 0.99))
        y = scale(self.Y[idx], self.Y_data_mean, self.Y_data_std)
        # Handle inconsistent static-delta relationship after normalization
        # (required for MSE + MGE combined loss; train.py:127-132).
        if self.recompute_deltas:
            y = recompute_delta_features(
                y, self.windows, self.stream_sizes, self.has_dynamic_features)
        return x, y

    def __len__(self):
        return len(self.X)


def round_up(n, multiple):
    return -(-n // multiple) * multiple


class BatchIterator:
    """Shuffled, bucket-padded batches of (x, y, lengths) float32 arrays.

    Each epoch: optionally shuffle (numpy RandomState seeded with
    ``seed + epoch`` for reproducibility), group into fixed-size batches, pad
    the time axis to ``round_up(batch_max_len, bucket_multiple)`` and pad the
    trailing batch with zero-length rows up to ``batch_size``.

    Host-side concurrency (the reference's ``DataLoader(num_workers,
    pin_memory)``, train.py:183-186):

      * ``num_workers > 0`` — batches are assembled (normalize + pad) by a
        thread pool and prefetched into a bounded window ahead of the
        consumer, so the next device step's batch is ready while the current
        one runs.  Order is identical to the synchronous path (multi-host DP
        depends on every process seeing the same batch sequence).  Threads,
        not processes: assembly is NumPy arithmetic that releases the GIL,
        and the arrays land directly in the consumer's address space.
      * ``cache_size > 0`` — up to that many NORMALIZED items are memoized
        across epochs (the nnmnkwii ``MemoryCacheDataset`` role), so steady-
        state epochs skip the per-item normalization entirely.
      * torch's ``pin_memory`` has no JAX analog (device_put manages its own
        staging buffers) — the knob is intentionally not reproduced.
    """

    def __init__(self, dataset, batch_size, shuffle, seed=1234,
                 bucket_multiple=32, num_workers=0, cache_size=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.bucket_multiple = bucket_multiple
        self.num_workers = num_workers
        self.cache_size = cache_size
        self._cache = {}
        self.epoch = 0

    def __len__(self):
        return -(-len(self.dataset) // self.batch_size)

    def _item(self, j):
        j = int(j)
        if self.cache_size <= 0:
            return self.dataset[j]
        item = self._cache.get(j)
        if item is None:
            item = self.dataset[j]
            if len(self._cache) < self.cache_size:
                self._cache[j] = item
        return item

    def _assemble(self, idx):
        B = self.batch_size
        items = [self._item(j) for j in idx]
        lengths = np.array([len(x) for x, _ in items], dtype=np.int32)
        T = round_up(int(lengths.max()), self.bucket_multiple)
        Dx = items[0][0].shape[-1]
        Dy = items[0][1].shape[-1]
        x = np.zeros((B, T, Dx), dtype=np.float32)
        y = np.zeros((B, T, Dy), dtype=np.float32)
        for k, (xi, yi) in enumerate(items):
            x[k, : len(xi)] = xi
            y[k, : len(yi)] = yi
        full_lengths = np.zeros(B, dtype=np.int32)
        full_lengths[: len(lengths)] = lengths
        return x, y, full_lengths

    def __iter__(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rs = np.random.RandomState(self.seed + self.epoch)
            rs.shuffle(order)
        self.epoch += 1
        B = self.batch_size
        batches = [order[i: i + B] for i in range(0, n, B)]
        if self.num_workers <= 0:
            for idx in batches:
                yield self._assemble(idx)
            return
        from concurrent.futures import ThreadPoolExecutor

        depth = max(2, 2 * self.num_workers)  # bounded prefetch window
        with ThreadPoolExecutor(self.num_workers) as ex:
            pending = [ex.submit(self._assemble, idx)
                       for idx in batches[:depth]]
            for idx in batches[depth:]:
                out = pending.pop(0).result()
                pending.append(ex.submit(self._assemble, idx))
                yield out
            for fut in pending:
                yield fut.result()
