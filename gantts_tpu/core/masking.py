"""Length masking and masked sequence losses (JAX).

TPU-native equivalent of ``gantts/seqloss.py``.  Variable-length utterances
are handled by zero-padding to a *bucketed* static length plus boolean masks —
never by packing (the cuDNN trick at reference models.py:104-112 has no TPU
analog; masking is the XLA-friendly formulation and is numerically identical
for every quantity the reference computes).
"""

from __future__ import annotations

import jax.numpy as jnp


def sequence_mask(lengths, max_len):
    """(B,) lengths -> (B, T) float 0/1 mask (gantts/seqloss.py:9-20).

    ``max_len`` must be a static Python int under jit (it is the bucketed
    padded length).
    """
    seq_range = jnp.arange(max_len, dtype=lengths.dtype)
    return (seq_range[None, :] < lengths[:, None]).astype(jnp.float32)


def masked_mse_loss(input, target, lengths=None, mask=None, max_len=None):
    """Masked, frame-normalized MSE (gantts/seqloss.py:27-43).

    ``sum((input - target)^2 * mask) / mask.sum()`` — note the denominator is
    the number of valid *frames* (mask is (B, T, 1)), not frames x dims,
    matching the reference exactly.
    """
    if lengths is None and mask is None:
        raise RuntimeError("Should provide either lengths or mask")
    if mask is None:
        if max_len is None:
            max_len = input.shape[1]
        mask = sequence_mask(lengths, max_len)[..., None]
    diff = (input - target) * mask
    return jnp.sum(diff * diff) / jnp.sum(mask)
