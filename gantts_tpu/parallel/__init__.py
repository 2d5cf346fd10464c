"""Device-mesh parallelism: data-parallel GAN training over ICI.

The reference is strictly single-device (SURVEY.md section 2.4: no DDP, no
collectives anywhere).  The TPU build adds DP as a first-class capability:

  * ``make_mesh`` builds a 1-D ``jax.sharding.Mesh`` over all (or N) devices
    with axis name ``"data"``;
  * batches are sharded over the leading (batch) axis, parameters and
    optimizer states are replicated;
  * the fused GAN step is jitted with these shardings — XLA's SPMD
    partitioner inserts the gradient/metric all-reduces (psum over ICI)
    automatically, because every loss is a global sum over the batch axis
    normalized by a global mask sum.  No hand-written collectives, no NCCL
    analog: the mesh + sharding annotations ARE the communication layer.

Multi-host: under ``jax.distributed`` the same code runs unchanged — the
mesh spans all hosts' devices, every host iterates the IDENTICAL global
batch sequence (same split, same shuffle seed — so batch counts, bucketed
shapes and the per-batch MLPG R agree across processes by construction),
and ``put_batch`` materializes only each host's addressable row shards via
``jax.make_array_from_callback``.  Verified by a real 2-process CPU
cluster test (tests/test_parallel.py).

Works identically on a CPU mesh (tests use
``XLA_FLAGS=--xla_force_host_platform_device_count=8``) and on TPU slices.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gantts_tpu.train.step import GanTrainer


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host bring-up: ``jax.distributed.initialize`` with the usual
    TPU-pod auto-detection when no arguments are given.  After this, every
    host sees the global device set and ``make_mesh()`` spans the pod (ICI
    within a slice, DCN across slices — XLA routes collectives)."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_mesh(n_devices=None, axis_name="data"):
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh, axis_name="data"):
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh):
    return NamedSharding(mesh, P())


def pad_batch_to_devices(arrs, lengths, n_devices):
    """Pad the batch axis with zero-length rows to a multiple of n_devices."""
    B = arrs[0].shape[0]
    rem = (-B) % n_devices
    if rem == 0:
        return arrs, lengths
    arrs = [np.concatenate(
        [a, np.zeros((rem,) + a.shape[1:], a.dtype)], axis=0) for a in arrs]
    lengths = np.concatenate([lengths, np.zeros(rem, lengths.dtype)])
    return arrs, lengths


class DataParallelGanTrainer(GanTrainer):
    """GanTrainer whose jitted step shards the batch over a mesh.

    Same step body as the single-chip trainer — the only delta is sharding
    annotations.  States/params/R/scalars are replicated; x/y/lengths/z are
    sharded on the batch axis.
    """

    def __init__(self, *args, mesh=None, **kwargs):
        super().__init__(*args, **kwargs)
        if mesh is None:
            mesh = make_mesh()
        self.mesh = mesh

    # -- operand placement ---------------------------------------------------
    def put_batch(self, x, y, lengths, z=None):
        """Shard the GLOBAL batch over the mesh's batch axis.

        The inputs are the full global batch — identical on every process
        (the loaders replay the same split/shuffle on every host) — padded
        here with zero-length rows to a multiple of the GLOBAL device count
        (inert under the masked losses).  ``make_array_from_callback``
        materializes only this process's addressable shards, so under
        multi-host each host uploads just its rows; single-host it is
        equivalent to a sharded ``device_put``."""
        n = int(self.mesh.devices.size)
        arrs = [np.asarray(x), np.asarray(y)]
        if z is not None:
            arrs.append(np.asarray(z))
        arrs, lengths = pad_batch_to_devices(arrs, np.asarray(lengths), n)
        sh = batch_sharding(self.mesh)

        def put(a):
            return jax.make_array_from_callback(
                a.shape, sh, lambda idx, a=a: a[idx])

        x, y = put(arrs[0]), put(arrs[1])
        z_out = put(arrs[2]) if z is not None else None
        return x, y, put(lengths), z_out

    def put_replicated(self, a):
        """Replicate a host value over the whole mesh.  Multi-host safe:
        the value is identical on every process (R matrices are built from
        the synchronized batch shapes), so materializing each host's
        addressable replicas from its local copy is a consistent global
        array.  Device arrays short-circuit: already-correctly-placed
        arrays pass through, fully-addressable ones move device-to-device
        (no host round trip)."""
        sh = replicated(self.mesh)
        if isinstance(a, jax.Array):
            if a.sharding == sh:
                return a
            if a.is_fully_addressable and jax.process_count() == 1:
                return jax.device_put(a, sh)
            if not a.is_fully_addressable:
                # np.asarray below would raise an obscure RuntimeError;
                # surface the contract violation instead (multi-host values
                # must arrive as host arrays or already-replicated arrays).
                raise ValueError(
                    "put_replicated got a non-fully-addressable jax.Array "
                    f"with sharding {a.sharding}; under multi-host, pass a "
                    "host (numpy) value or an array already replicated "
                    "over this mesh.")
        a = np.asarray(a)
        return jax.make_array_from_callback(a.shape, sh,
                                            lambda idx: a[idx])

    def place_states(self, *states):
        """Replicate model/optimizer state pytrees over the mesh (leaf by
        leaf) — required before the first multi-host step."""
        return tuple(
            jax.tree_util.tree_map(self.put_replicated, s) for s in states)

    # the fused multi-step driver has no sharded variant (loop.py falls
    # back to one dispatch per batch on a mesh, where dispatch overhead
    # is not serialized against a single chip's tunnel)
    supports_multi_step = False

    def step_fn(self, train: bool):
        key = bool(train)
        if key not in self._jitted:
            repl = replicated(self.mesh)
            data = batch_sharding(self.mesh)
            in_shardings = (
                repl,  # gstate
                repl,  # dstate
                repl,  # ref_params (None ok)
                data,  # x
                data,  # y
                data,  # lengths
                repl,  # R
                data if self.cfg.add_noise else repl,  # z (None ok)
                repl,  # adv_w
                repl,  # rng
            )
            self._jitted[key] = jax.jit(
                partial(self._step, train),
                in_shardings=in_shardings,
                out_shardings=repl,
                donate_argnums=(0, 1) if train else (),
            )
        return self._jitted[key]


# ---------------------------------------------------------------------------
# Sequence-parallel (time-sharded) MLPG — the long-context story
# ---------------------------------------------------------------------------

def time_sharded_unit_variance_mlpg(means, windows, mesh, axis_name="data",
                                    halfwidth=None):
    """Unit-variance MLPG with the TIME axis sharded across the mesh.

    The only super-linear-in-T object in this framework is the MLPG system
    (dense R is (T, 3T)); the blocked-Toeplitz stencil (core/fast_mlpg.py)
    makes it local-plus-halo: every output frame depends on at most W=24
    frames to each side, except the first/last W frames which need the exact
    boundary blocks.  So sequence parallelism is one halo exchange:

      * each device holds T/n contiguous frames of (B, T, K*S);
      * it receives W frames from each neighbor via ``jax.lax.ppermute``
        (edge devices receive zeros — exactly the zero-pad semantics of the
        unsharded operator);
      * the interior blocked matmul runs locally;
      * the first/last device overwrite their first/last W frames with the
        exact boundary solutions (the boundary blocks span 2W frames, which
        each edge device holds locally — requires T/n >= 2W).

    Exactness: identical to ``unit_variance_mlpg_stencil`` (itself ~1e-6
    from dense) — no approximation is introduced by the sharding.  The
    collectives are two W-frame ``ppermute``s over ICI per call: O(W/T_loc)
    relative traffic, vanishing for long sequences.

    Args:
      means: (B, T, K*S), T sharded over ``axis_name`` (global view).
      windows: the delta-window set.
      mesh: 1-D ``jax.sharding.Mesh``.
    Returns: (B, T, S) with the same time sharding.
    """
    import jax.numpy as jnp
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from gantts_tpu.core.fast_mlpg import (
        DEFAULT_HALFWIDTH,
        _stencil_parts,
        _windows_key,
    )

    W = halfwidth or DEFAULT_HALFWIDTH
    key = _windows_key(windows)
    _, top_np, bot_np = _stencil_parts(key, W)
    K = len(windows)
    n_dev = int(mesh.devices.size)

    B, T, KS = means.shape
    S = KS // K
    T_loc = T // n_dev
    if T % n_dev or T_loc < 2 * W:
        raise ValueError(
            f"time-sharded MLPG needs T divisible by {n_dev} devices with "
            f">= {2 * W} frames per shard (got T={T})")

    from gantts_tpu.core.fast_mlpg import _interior_blocked

    def local_fn(u):
        # u: (B, T_loc, K*S) local shard
        i = jax.lax.axis_index(axis_name)
        uk = u.reshape(B, T_loc, K, S)
        # halo exchange: edge devices get zeros (ppermute drops no-source)
        right_edge = uk[:, -W:]    # send to the right neighbor
        left_edge = uk[:, :W]      # send to the left neighbor
        from_left = jax.lax.ppermute(
            right_edge, axis_name,
            perm=[(d, d + 1) for d in range(n_dev - 1)])
        from_right = jax.lax.ppermute(
            left_edge, axis_name,
            perm=[(d + 1, d) for d in range(n_dev - 1)])
        u_halo = jnp.concatenate([from_left, uk, from_right], axis=1)

        # interior: the SAME 128-block Toeplitz matmul as the unsharded
        # stencil, run over [halo | local | halo]; the center T_loc outputs
        # see only real data (the operator's own zero-padding lands in the
        # discarded edge outputs).
        y = _interior_blocked(u_halo, key, W,
                              jax.lax.Precision.HIGHEST)[:, W:W + T_loc]

        # exact boundaries on the edge devices
        top = jnp.asarray(top_np)
        bot = jnp.asarray(bot_np)
        C = 2 * W
        y_top = jnp.einsum("bcks,kwc->bws", uk[:, :C], top,
                           precision=jax.lax.Precision.HIGHEST)
        y_bot = jnp.einsum("bcks,kwc->bws", uk[:, -C:], bot,
                           precision=jax.lax.Precision.HIGHEST)
        y = jnp.where(i == 0, y.at[:, :W].set(y_top), y)
        y = jnp.where(i == n_dev - 1, y.at[:, -W:].set(y_bot), y)
        return y

    fn = shard_map(local_fn, mesh=mesh,
                   in_specs=P(None, axis_name, None),
                   out_specs=P(None, axis_name, None))
    return fn(means)
