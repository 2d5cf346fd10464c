"""Checkpoint save/restore with the reference's naming contract.

The 5-stage GAN curriculum (train_gan.sh:40-44) hands state between separate
processes purely through files named
``checkpoint_epoch{N}_{Generator|Discriminator}.pth`` containing
{state_dict, optimizer, global_epoch} (reference train.py:162-171, 651-658).
We keep the exact names and keys so curriculum drivers port unchanged, but
the payload is a flax msgpack blob, not a pickle: the current format never
executes code on load, and msgpack state-dicts survive jax/flax class
renames that break pickled pytrees (the ``Dense_0`` migration shim below is
the fossil of one such rename).  Pickle files written by earlier revisions
are still read via a legacy fallback — note that path IS code-executing
(pickle semantics), so it warns loudly and can be disabled entirely with
``GANTTS_TPU_ALLOW_PICKLE_CKPT=0`` when loading files from untrusted
sources.
"""

from __future__ import annotations

import os
import pickle
from os.path import join

import jax
import numpy as np
from flax import serialization


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
        "state_dict": serialization.to_state_dict(
            jax.device_get(state.params)),
        # to_state_dict flattens the optax namedtuple chain into plain
        # dicts keyed by position — structure is re-imposed at load time
        # from a freshly initialized opt_state (from_state_dict).
        "optimizer": serialization.to_state_dict(
            jax.device_get(state.opt_state)),
        "global_epoch": int(epoch),
    }
    if jax.process_index() != 0:
        return checkpoint_path
    tmp_path = checkpoint_path + ".tmp"
    with open(tmp_path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp_path, checkpoint_path)
    print("Saved checkpoint:", checkpoint_path)
    return checkpoint_path


def _migrate_dense_scope(tree):
    """Back-compat: TorchLinear used to wrap flax ``nn.Dense``, nesting its
    kernel/bias one level deeper under a ``Dense_0`` scope.  Checkpoints
    written before the direct-param change are flattened on load so old
    models keep resuming/evaluating.  The match requires the wrapped child
    to hold exactly {kernel, bias} so a future module that legitimately
    scopes a single Dense under another name is never silently rewritten."""
    if isinstance(tree, tuple):  # optax states (incl. namedtuples)
        vals = [_migrate_dense_scope(v) for v in tree]
        return type(tree)(*vals) if hasattr(tree, "_fields") \
            else type(tree)(vals)
    if isinstance(tree, list):
        return [_migrate_dense_scope(v) for v in tree]
    if not isinstance(tree, dict):
        return tree
    if set(tree.keys()) == {"Dense_0"} and isinstance(tree["Dense_0"], dict) \
            and set(tree["Dense_0"].keys()) == {"kernel", "bias"}:
        return dict(tree["Dense_0"])
    return {k: _migrate_dense_scope(v) for k, v in tree.items()}


def _is_legacy_pickle(blob):
    # Pickle protocol 2+ opens with PROTO (0x80) + protocol number; a
    # msgpack payload opens with fixmap 0x83 (three top-level keys), so the
    # two are unambiguous on the first byte pair.
    return len(blob) >= 2 and blob[0] == 0x80 and blob[1] <= 5


def load_checkpoint(path, opt_template=None):
    """Returns (params, opt_state_or_None, global_epoch).

    ``opt_template`` — a freshly initialized opt_state whose tree structure
    the stored optimizer state-dict is restored into (msgpack flattens the
    optax namedtuples; flax ``from_state_dict`` re-imposes the classes).
    Without a template the optimizer comes back as nested plain dicts —
    fine for params-only consumers (the eval scripts), unusable for
    ``tx.update``.  Legacy pickle checkpoints carry their own structure and
    ignore the template.
    """
    print(f"Load checkpoint from: {path}")
    with open(path, "rb") as f:
        blob = f.read()
    if _is_legacy_pickle(blob):
        # Unpickling executes code embedded in the file; only safe for
        # checkpoints this codebase wrote before the msgpack format.
        if os.environ.get("GANTTS_TPU_ALLOW_PICKLE_CKPT", "1") == "0":
            raise ValueError(
                f"{path} is a legacy pickle checkpoint and "
                "GANTTS_TPU_ALLOW_PICKLE_CKPT=0 forbids loading it "
                "(unpickling untrusted data executes arbitrary code)")
        import warnings

        warnings.warn(
            f"loading legacy pickle checkpoint {path}; pickle executes "
            "code on load — set GANTTS_TPU_ALLOW_PICKLE_CKPT=0 to refuse "
            "these files", stacklevel=2)
        payload = pickle.loads(blob)
        opt = payload.get("optimizer")
    else:
        payload = serialization.msgpack_restore(blob)
        opt = payload.get("optimizer")
        if opt is not None and opt_template is not None:
            opt = serialization.from_state_dict(opt_template, opt)
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
