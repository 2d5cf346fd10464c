"""Startup wiring: dataset discovery, stats collection, dim inference,
model/optimizer/state construction — the reference ``__main__`` logic
(train.py:661-828) as reusable functions.
"""

from __future__ import annotations

from os.path import join

import numpy as np
import jax
import jax.numpy as jnp

from gantts_tpu import preprocessing as P
from gantts_tpu.core.streams import get_static_stream_sizes
from gantts_tpu.data import BatchIterator, NPYDataSource, TTSDataset, VCDataset
from gantts_tpu.models import create_model, include_parameter_generation
from gantts_tpu.train.optim import create_optimizer
from gantts_tpu.train.step import TrainState


def load_arrays(inputs_dir, outputs_dir, max_files=None):
    """Load the train/test .npy splits for X and Y (train.py:701-716)."""
    X, Y, utt_lengths = {}, {}, {}
    for phase in ["train", "test"]:
        train = phase == "train"
        X[phase] = NPYDataSource(inputs_dir, train=train,
                                 max_files=max_files).load()
        Y[phase] = NPYDataSource(outputs_dir, train=train,
                                 max_files=max_files).load()
        x_lengths = np.array([len(x) for x in X[phase]])
        y_lengths = np.array([len(y) for y in Y[phase]])
        assert np.allclose(x_lengths, y_lengths), \
            "X and Y must be time aligned"
        utt_lengths[phase] = x_lengths
        print(f"Size of dataset for {phase}: {len(X[phase])}")
    return X, Y, utt_lengths


def prepare_vc(X, Y, utt_lengths, hp, data_dir):
    """Pooled X∪Y stats, persisted; dim inference (train.py:723-741)."""
    data_mean, data_var, n = P.meanvar(
        X["train"], utt_lengths["train"], return_last_sample_count=True)
    data_mean, data_var = P.meanvar(
        Y["train"], utt_lengths["train"], mean_=data_mean, var_=data_var,
        last_sample_count=n)
    data_std = np.sqrt(data_var)

    np.save(join(data_dir, "data_mean"), data_mean)
    np.save(join(data_dir, "data_var"), data_var)

    if hp.generator_params["in_dim"] is None:
        hp.generator_params["in_dim"] = data_mean.shape[-1]
    if hp.generator_params["out_dim"] is None:
        hp.generator_params["out_dim"] = data_mean.shape[-1]

    loaders = {}
    for phase in ["train", "test"]:
        # Multi-host: every host iterates the IDENTICAL global batch
        # sequence (same split, same shuffle seed) — batch counts, bucketed
        # shapes, and the per-batch MLPG R are then consistent across
        # processes by construction, and DataParallelGanTrainer.put_batch
        # uploads only each host's row shard.  Round-robin FILE sharding
        # (an earlier design) desyncs batch counts and padded lengths
        # between hosts, deadlocking the SPMD collectives.
        #
        # Memory bound: each process holds the FULL corpus in host RAM.
        # At this problem's scale that is small — the largest reference
        # workload (slt_arctic, ~1132 utterances x ~800 frames x 187 dims
        # f32) is ~0.7 GB, and CMU ARCTIC VC is ~0.1 GB — against >=100 GB
        # of host RAM per TPU-v5e host.  The corpus would have to grow
        # ~100x before a streaming loader pays for its complexity; if that
        # happens, the contract to preserve is the global batch SCHEDULE
        # (lengths + padded shapes identical everywhere), with only the
        # row payloads loaded lazily per host.
        ds = VCDataset(X[phase], Y[phase], data_mean, data_std)
        loaders[phase] = BatchIterator(
            ds, hp.batch_size, shuffle=(phase == "train"),
            bucket_multiple=hp.batch_bucket_multiple,
            num_workers=hp.num_workers, cache_size=hp.cache_size)
    return loaders, data_mean, data_std


def infer_tts_dims(hp, X_data_min, Y_data_mean):
    """Reference train.py:753-768 (incl. discriminator in_dim arithmetic)."""
    if hp.generator_params["in_dim"] is None:
        D = X_data_min.shape[-1]
        if hp.generator_add_noise:
            D = D + hp.generator_noise_dim
        hp.generator_params["in_dim"] = D
    if hp.generator_params["out_dim"] is None:
        hp.generator_params["out_dim"] = Y_data_mean.shape[-1]
    if hp.discriminator_params["in_dim"] is None:
        sizes = get_static_stream_sizes(
            hp.stream_sizes, hp.has_dynamic_features, len(hp.windows))
        D = int(np.asarray(sizes)[np.asarray(hp.adversarial_streams)].sum())
        if hp.adversarial_streams[0]:
            D -= hp.mask_nth_mgc_for_adv_loss
        if hp.discriminator_linguistic_condition:
            D = D + X_data_min.shape[-1]
        hp.discriminator_params["in_dim"] = D


def prepare_tts(X, Y, utt_lengths, hp, data_dir):
    """Per-model X min/max + Y mean/var stats, persisted under the same file
    names the eval scripts expect (train.py:743-770)."""
    ty = hp.name if hp.name in ("acoustic", "duration") else "duration"
    X_data_min, X_data_max = P.minmax(X["train"])
    Y_data_mean, Y_data_var = P.meanvar(Y["train"])
    Y_data_std = np.sqrt(Y_data_var)

    np.save(join(data_dir, f"X_{ty}_data_min"), X_data_min)
    np.save(join(data_dir, f"X_{ty}_data_max"), X_data_max)
    np.save(join(data_dir, f"Y_{ty}_data_mean"), Y_data_mean)
    np.save(join(data_dir, f"Y_{ty}_data_var"), Y_data_var)

    infer_tts_dims(hp, X_data_min, Y_data_mean)

    loaders = {}
    for phase in ["train", "test"]:
        # identical global batches on every host — see prepare_vc
        ds = TTSDataset(X[phase], Y[phase], X_data_min, X_data_max,
                        Y_data_mean, Y_data_std,
                        recompute_deltas=hp.recompute_delta_features,
                        windows=hp.windows, stream_sizes=hp.stream_sizes,
                        has_dynamic_features=hp.has_dynamic_features)
        loaders[phase] = BatchIterator(
            ds, hp.batch_size, shuffle=(phase == "train"),
            bucket_multiple=hp.batch_bucket_multiple,
            num_workers=hp.num_workers, cache_size=hp.cache_size)
    return loaders, Y_data_mean, Y_data_std


def init_models_and_states(hp, seed=1234):
    """Reflective model construction + optimizer/state init
    (train.py:773-799)."""
    cd = getattr(hp, "compute_dtype", "float32")
    model_g = create_model(hp.generator, compute_dtype=cd,
                           **hp.generator_params)
    model_d = create_model(hp.discriminator, compute_dtype=cd,
                           **hp.discriminator_params)

    key = jax.random.PRNGKey(seed)
    kg, kd = jax.random.split(key)
    T0 = 64
    x_g = jnp.zeros((1, T0, hp.generator_params["in_dim"]), jnp.float32)
    lengths0 = jnp.full((1,), T0, jnp.int32)
    if include_parameter_generation(model_g):
        from gantts_tpu.core.windows import unit_variance_mlpg_matrix

        R0 = jnp.asarray(unit_variance_mlpg_matrix(hp.windows, T0))
        params_g = model_g.init(kg, x_g, R0, lengths0)
    else:
        params_g = model_g.init(kg, x_g, lengths0)
    x_d = jnp.zeros((1, T0, hp.discriminator_params["in_dim"]), jnp.float32)
    params_d = model_d.init(kd, x_d, lengths0)

    tx_g = create_optimizer(hp.optimizer_g, hp.optimizer_g_params)
    tx_d = create_optimizer(hp.optimizer_d, hp.optimizer_d_params)
    gstate = TrainState(params=params_g, opt_state=tx_g.init(params_g))
    dstate = TrainState(params=params_d, opt_state=tx_d.init(params_d))
    return model_g, model_d, tx_g, tx_d, gstate, dstate
