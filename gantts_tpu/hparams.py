"""Hyper-parameter bundles — field-for-field surface of the reference hparams.py.

The reference builds three ``tf.contrib.training.HParams`` namespaces
(hparams.py:16, 87, 167) selected by name (train.py:665) and overridable via a
``"k=v,k2=v2"`` string (train.py:668).  This module provides the same three
bundles (``vc``, ``tts_duration``, ``tts_acoustic``) with identical field
names and default values, a compatible :meth:`HParams.parse`, and
``hparams_debug_string`` (reference hparams.py:9-12) — with no TensorFlow
dependency.

The only semantic deltas, both deliberate and TPU-motivated:
  * ``batch_bucket_multiple`` (new): padded sequence lengths are rounded up to
    a multiple of this so XLA sees a bounded set of static shapes.
  * ``compute_dtype`` (new): matmul precision knob ("float32" | "bfloat16").
Fields left as ``None`` (model in/out dims) are inferred from data stats at
startup exactly as the reference does (train.py:735-768).
"""

from __future__ import annotations

import ast
from os.path import dirname, join

import numpy as np


class HParams:
    """Minimal HParams: attribute access, ``values()``, ``parse("k=v,...")``.

    Parse semantics follow tf.contrib.training.HParams: values are cast to
    the type of the existing default; lists accept python-literal syntax.
    """

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", dict(kwargs))

    def __getattr__(self, name):
        try:
            return object.__getattribute__(self, "_values")[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self._values[name] = value

    def values(self):
        return dict(self._values)

    def copy(self):
        import copy

        return HParams(**copy.deepcopy(self._values))

    def parse(self, spec):
        if not spec:
            return self
        for key, raw in _split_kv(spec):
            if key not in self._values:
                raise ValueError(f"Unknown hyperparameter: {key}")
            self._values[key] = _cast_like(self._values[key], raw)
        return self

    def __repr__(self):
        return f"HParams({self._values!r})"


def _split_kv(spec):
    """Split 'a=1,b=[1, 2],c=x' on commas not inside brackets/parens."""
    items, depth, cur = [], 0, ""
    for ch in spec:
        if ch in "[({":
            depth += 1
        elif ch in "])}":
            depth -= 1
        if ch == "," and depth == 0:
            if cur.strip():
                items.append(cur.strip())
            cur = ""
        else:
            cur += ch
    if cur.strip():
        items.append(cur.strip())
    out = []
    for item in items:
        if "=" not in item:
            raise ValueError(f"Malformed hparam override: {item!r}")
        k, v = item.split("=", 1)
        out.append((k.strip(), v.strip()))
    return out


def _cast_like(default, raw):
    if isinstance(default, bool):
        if raw.lower() in ("true", "1"):
            return True
        if raw.lower() in ("false", "0"):
            return False
        raise ValueError(f"Cannot parse bool from {raw!r}")
    if isinstance(default, int) and not isinstance(default, bool):
        return int(raw)
    if isinstance(default, float):
        return float(raw)
    if isinstance(default, (list, tuple, dict)) or default is None:
        try:
            return ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            return raw
    return raw  # str


def hparams_debug_string(params):
    values = params.values()
    hp = ["  %s: %s" % (name, values[name]) for name in sorted(values)]
    return "Hyperparameters:\n" + "\n".join(hp)


# ---------------------------------------------------------------------------
# The three bundles.  Field names and defaults mirror reference hparams.py
# exactly; optimizer names map onto the optax registry in train/optim.py with
# torch-compatible semantics.
# ---------------------------------------------------------------------------

# Hyper parameters for voice conversion (reference hparams.py:16-84)
vc = HParams(
    name="vc",

    # Acoustic features
    order=59,
    frame_period=5,
    windows=[
        (0, 0, np.array([1.0])),
        (1, 1, np.array([-0.5, 0.0, 0.5])),
        (1, 1, np.array([1.0, -2.0, 1.0])),
    ],
    stream_sizes=[59 * 3],
    has_dynamic_features=[True],

    adversarial_streams=[True],
    # In vc, 0-th coefficients are masked in feature extraction stage.
    mask_nth_mgc_for_adv_loss=0,

    # Generator.  For RNN VC, use In2OutRNNHighwayNet.
    generator_add_noise=False,
    generator_noise_dim=200,
    generator="In2OutHighwayNet",
    generator_params={
        "in_dim": None,
        "out_dim": None,
        "num_hidden": 3,
        "hidden_dim": 512,
        "static_dim": 59,
        "dropout": 0.5,
    },
    optimizer_g="Adagrad",
    optimizer_g_params={
        "lr": 0.01,
        "weight_decay": 0,
    },

    # Discriminator
    discriminator_linguistic_condition=False,
    discriminator="MLP",
    discriminator_params={
        "in_dim": 59,
        "out_dim": 1,
        "num_hidden": 2,
        "hidden_dim": 256,
        "dropout": 0.5,
        "last_sigmoid": True,
    },
    optimizer_d="Adagrad",
    optimizer_d_params={
        "lr": 0.01,
        "weight_decay": 0,
    },

    # This should be overridden
    nepoch=200,

    # LR schedule
    lr_decay_schedule=False,
    lr_decay_epoch=10,

    # Datasets and data loader
    batch_size=20,
    num_workers=1,
    pin_memory=True,
    cache_size=1200,

    # --- TPU-build additions ---
    batch_bucket_multiple=32,   # pad T up to a multiple of this (static shapes)
    compute_dtype="float32",
    mlpg_impl="dense",          # "dense" | "stencil" (O(T*W) conv MLPG)
)


# Hyper parameters for TTS duration model (reference hparams.py:87-164)
tts_duration = HParams(
    name="duration",

    # Linguistic features
    use_phone_alignment=False,
    subphone_features=None,
    add_frame_features=False,
    question_path=join(dirname(__file__), "..", "data",
                       "questions-radio_dnn_416.hed"),

    # Duration features
    windows=[
        (0, 0, np.array([1.0])),
    ],
    stream_sizes=[5],
    has_dynamic_features=[False],

    recompute_delta_features=False,

    # Streams used for computing adversarial loss
    adversarial_streams=[True],
    mask_nth_mgc_for_adv_loss=0,

    # Generator
    generator="SRURNN",
    generator_add_noise=False,
    generator_noise_dim=200,
    generator_params={
        "in_dim": None,  # None will be set automatically
        "out_dim": None,
        "num_hidden": 6,
        "hidden_dim": 512,
        "bidirectional": True,
        "dropout": 0.0,
        "use_relu": 1,
        "rnn_dropout": 0.2,
        "last_sigmoid": False,
    },
    optimizer_g="Adam",
    optimizer_g_params={
        "lr": 0.001,
        "betas": (0.5, 0.9),
        "weight_decay": 0,
    },

    # Discriminator
    discriminator_linguistic_condition=True,
    discriminator="MLP",
    discriminator_params={
        "in_dim": None,  # None will be set automatically
        "out_dim": 1,
        "num_hidden": 3,
        "hidden_dim": 256,
        "dropout": 0.0,
        "last_sigmoid": True,
    },
    optimizer_d="Adam",
    optimizer_d_params={
        "lr": 0.001,
        "betas": (0.5, 0.9),
        "weight_decay": 0,
    },

    # This should be overridden
    nepoch=200,

    # LR schedule
    lr_decay_schedule=False,
    lr_decay_epoch=25,

    # Datasets and data loader
    batch_size=32,
    num_workers=1,
    pin_memory=True,
    cache_size=1200,

    # --- TPU-build additions ---
    batch_bucket_multiple=32,
    compute_dtype="float32",
    mlpg_impl="dense",          # "dense" | "stencil" (O(T*W) conv MLPG)
)

# Hyper parameters for TTS acoustic model (reference hparams.py:167-258)
tts_acoustic = HParams(
    name="acoustic",

    # Linguistic
    use_phone_alignment=False,
    subphone_features="full",
    add_frame_features=True,
    question_path=join(dirname(__file__), "..", "data",
                       "questions-radio_dnn_416.hed"),

    # Acoustic features
    order=59,
    frame_period=5,
    f0_floor=71.0,
    f0_ceil=700,
    use_harvest=True,  # If False, use dio and stonemask
    windows=[
        (0, 0, np.array([1.0])),
        (1, 1, np.array([-0.5, 0.0, 0.5])),
        (1, 1, np.array([1.0, -2.0, 1.0])),
    ],
    f0_interpolation_kind="quadratic",
    mod_spec_smoothing=True,
    mod_spec_smoothing_cutoff=50,  # Hz

    recompute_delta_features=False,

    # Stream info: (mgc, lf0, vuv, bap)
    stream_sizes=[180, 3, 1, 3],
    has_dynamic_features=[True, True, False, True],

    # Streams used for computing adversarial loss.
    # NOTE: you should probably change discriminator's `in_dim`
    # if you change the adv_streams
    adversarial_streams=[True, False, False, False],
    # mask 0 to n-th mgc for adversarial loss
    mask_nth_mgc_for_adv_loss=2,

    # Generator
    generator_add_noise=False,
    generator_noise_dim=200,
    generator="SRURNN",
    generator_params={
        "in_dim": None,  # None will be set automatically
        "out_dim": None,
        "num_hidden": 6,
        "hidden_dim": 512,
        "bidirectional": True,
        "dropout": 0.2,
        "use_relu": 1,
        "rnn_dropout": 0.2,
        "last_sigmoid": False,
    },
    optimizer_g="Adagrad",
    optimizer_g_params={
        "lr": 0.01,
        "weight_decay": 1e-7,
    },

    # Discriminator
    discriminator_linguistic_condition=True,
    discriminator="MLP",
    discriminator_params={
        "in_dim": None,  # None will be set automatically
        "out_dim": 1,
        "num_hidden": 3,
        "hidden_dim": 256,
        "dropout": 0.5,
        "last_sigmoid": True,
    },
    optimizer_d="Adagrad",
    optimizer_d_params={
        "lr": 0.01,
        "weight_decay": 1e-7,
    },

    # This should be overridden
    nepoch=200,

    # LR schedule
    lr_decay_schedule=False,
    lr_decay_epoch=25,

    # Datasets and data loader
    batch_size=20,
    num_workers=1,
    pin_memory=True,
    cache_size=1200,

    # --- TPU-build additions ---
    batch_bucket_multiple=32,
    compute_dtype="float32",
    mlpg_impl="dense",          # "dense" | "stencil" (O(T*W) conv MLPG)
)
