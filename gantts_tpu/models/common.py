"""Shared building blocks for the model zoo.

Initialization matches torch defaults (reference models are plain
``torch.nn`` modules): both Linear kernels and biases are sampled from
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (torch's kaiming_uniform(a=sqrt(5))
reduces to exactly this bound), and every LSTM/SRU parameter uses
U(-1/sqrt(hidden), 1/sqrt(hidden)) like ``torch.nn.LSTM``.  Matching the
reference's init keeps optimizer hyperparameters (Adagrad lr=0.01 etc.,
hparams.py:48-51) transplantable without retuning.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def torch_uniform_init(bound):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class TorchLinear(nn.Module):
    """nn.Dense with torch nn.Linear's default init."""

    features: int

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = 1.0 / (fan_in ** 0.5)
        return nn.Dense(
            self.features,
            kernel_init=torch_uniform_init(bound),
            bias_init=torch_uniform_init(bound),
        )(x)


def leaky_relu(x):
    """torch.nn.LeakyReLU default negative_slope=0.01 (models.py:37)."""
    return jax.nn.leaky_relu(x, negative_slope=0.01)


def reverse_padded(x, lengths):
    """Reverse each sequence within its valid length (padding stays put).

    Replaces the role of torch's pack_padded_sequence for the backward
    direction of bidirectional RNNs (reference models.py:104-112): frame t of
    the output is frame (length-1-t) of the input for t < length; frames at
    or beyond length are garbage and must be masked by the caller.
    Involutive: applying it twice restores the valid region.
    """
    T = x.shape[1]
    idx = lengths[:, None] - 1 - jnp.arange(T, dtype=lengths.dtype)[None, :]
    idx = jnp.clip(idx, 0, T - 1)
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


def default_lengths(x, lengths):
    if lengths is None:
        B, T = x.shape[0], x.shape[1]
        return jnp.full((B,), T, dtype=jnp.int32)
    return lengths.astype(jnp.int32)
