"""Checkpoint save/restore with the reference's naming contract.

The 5-stage GAN curriculum (train_gan.sh:40-44) hands state between separate
processes purely through files named
``checkpoint_epoch{N}_{Generator|Discriminator}.pth`` containing
{state_dict, optimizer, global_epoch} (reference train.py:162-171, 651-658).
We keep the exact names and keys (contents are JAX pytrees, pickled with
device arrays pulled to host) so curriculum drivers port unchanged.
"""

from __future__ import annotations

import os
import pickle
from os.path import join

import jax
import numpy as np


def save_checkpoint(state, epoch, checkpoint_dir, name):
    """state: TrainState(params, opt_state). Name in {Generator, Discriminator}.

    Multi-host safe: params are replicated under data parallelism, so only
    process 0 writes (all hosts still participate in the device_get), and
    the file is written atomically via rename so a crash mid-write never
    leaves a corrupt checkpoint for the curriculum's next stage to load.
    """
    checkpoint_path = join(
        checkpoint_dir, f"checkpoint_epoch{epoch}_{name}.pth")
    payload = {
        "state_dict": jax.device_get(state.params),
        "optimizer": jax.device_get(state.opt_state),
        "global_epoch": int(epoch),
    }
    if jax.process_index() != 0:
        return checkpoint_path
    tmp_path = checkpoint_path + ".tmp"
    with open(tmp_path, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp_path, checkpoint_path)
    print("Saved checkpoint:", checkpoint_path)
    return checkpoint_path


def _migrate_dense_scope(tree):
    """Back-compat: TorchLinear used to wrap flax ``nn.Dense``, nesting its
    kernel/bias one level deeper under a ``Dense_0`` scope.  Checkpoints
    written before the direct-param change are flattened on load so old
    models keep resuming/evaluating."""
    if isinstance(tree, tuple):  # optax states (incl. namedtuples)
        vals = [_migrate_dense_scope(v) for v in tree]
        return type(tree)(*vals) if hasattr(tree, "_fields") \
            else type(tree)(vals)
    if isinstance(tree, list):
        return [_migrate_dense_scope(v) for v in tree]
    if not isinstance(tree, dict):
        return tree
    if set(tree.keys()) == {"Dense_0"} and isinstance(tree["Dense_0"], dict):
        return dict(tree["Dense_0"])
    return {k: _migrate_dense_scope(v) for k, v in tree.items()}


def load_checkpoint(path):
    """Returns (params, opt_state_or_None, global_epoch)."""
    print(f"Load checkpoint from: {path}")
    with open(path, "rb") as f:
        payload = pickle.load(f)
    opt = payload.get("optimizer")
    return (_migrate_dense_scope(payload["state_dict"]),
            _migrate_dense_scope(opt) if opt is not None else None,
            int(payload["global_epoch"]))


def tree_shapes_match(a, b):
    """Structural compatibility check before adopting restored params."""
    ta = jax.tree_util.tree_structure(a)
    tb = jax.tree_util.tree_structure(b)
    if ta != tb:
        return False
    return all(np.shape(x) == np.shape(y)
               for x, y in zip(jax.tree_util.tree_leaves(a),
                               jax.tree_util.tree_leaves(b)))
