"""SRU (Simple Recurrent Unit) — the default TTS generator, as a parallel scan.

The reference imports the CUDA-only fused kernel ``cuda_functional.SRU``
(models.py:144-154; Lei et al. 2017) — the one RNN in the zoo whose
recurrence is *elementwise*:

    c_t = f_t * c_{t-1} + (1 - f_t) * x~_t
    h_t = r_t * g(c_t) + (1 - r_t) * x'_t        (highway bypass)

Elementwise recurrences are exactly the shape TPUs like: all input
projections (x~, f, r, highway) are ONE big MXU matmul over the whole
(B, T) block, and the only sequential dependency — the c_t chain — is a
first-order linear recurrence, computed here with
``jax.lax.associative_scan`` (Blelloch parallel scan: O(log T) depth, fully
vectorized over batch and hidden).  No Pallas needed for correctness; a
fused Pallas variant lives in kernels/ as an optimization.

Masking: padded steps use f_t = 1, input contribution 0, so the state is
carried through unchanged and outputs past the length are zeroed.

Config surface matches the reference (hparams.py:111-122, 211-222):
``use_relu`` selects g = relu (else tanh), ``rnn_dropout`` is applied to the
layer input, ``dropout`` between layers, ``bidirectional`` concatenates an
independent reversed-direction unit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from gantts_tpu.models.common import (
    default_lengths,
    reverse_padded,
    torch_uniform_init,
)


def linear_recurrence(f, b):
    """c_t = f_t * c_{t-1} + b_t with c_0 = 0, along axis 1, via parallel scan.

    The pair (f, b) composes associatively:
      (f2, b2) o (f1, b1) = (f1*f2, f2*b1 + b2).
    """
    def combine(left, right):
        f1, b1 = left
        f2, b2 = right
        return f1 * f2, f2 * b1 + b2

    _, c = jax.lax.associative_scan(combine, (f, b), axis=1)
    return c


def dispatch_linear_recurrence(f, b):
    """Pallas grid-scan on TPU (minimal HBM traffic, see kernels/sru_scan.py),
    associative scan elsewhere."""
    from gantts_tpu import kernels

    if kernels.default_use_pallas():
        return kernels.linear_recurrence_pallas(f, b)
    return linear_recurrence(f, b)


class SRULayer(nn.Module):
    """One direction of one SRU layer."""

    hidden_dim: int
    use_relu: int = 0

    @nn.compact
    def __call__(self, x, mask):
        B, T, D = x.shape
        H = self.hidden_dim
        bound = 1.0 / (H ** 0.5)
        init = torch_uniform_init(bound)
        # k=3 projection blocks (x~, f, r); +1 highway projection if D != H.
        k = 3 if D == H else 4
        w = self.param("w", init, (D, k * H))
        bf = self.param("bf", init, (H,))
        br = self.param("br", init, (H,))

        u = x @ w  # single MXU matmul for the whole block
        x_tilde = u[..., :H]
        f = jax.nn.sigmoid(u[..., H:2 * H] + bf)
        r = jax.nn.sigmoid(u[..., 2 * H:3 * H] + br)
        x_prime = x if D == H else u[..., 3 * H:]

        # Masked linear recurrence: padded steps carry the state through.
        f_m = f * mask + (1.0 - mask)          # f -> 1 on padding
        b_m = (1.0 - f) * x_tilde * mask       # input contribution -> 0
        c = dispatch_linear_recurrence(f_m, b_m)

        g = jax.nn.relu if self.use_relu else jnp.tanh
        h = r * g(c) + (1.0 - r) * x_prime
        return h * mask


class SRU(nn.Module):
    """Multi-layer (bi)SRU matching the cuda_functional.SRU surface."""

    hidden_dim: int
    num_layers: int
    bidirectional: bool = False
    dropout: float = 0.0        # between layers
    rnn_dropout: float = 0.0    # on each layer's input
    use_relu: int = 0

    @nn.compact
    def __call__(self, x, lengths=None, deterministic=True):
        lengths = default_lengths(x, lengths)
        T = x.shape[1]
        mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(x.dtype)
        mask = mask[:, :, None]
        out = x
        for layer in range(self.num_layers):
            inp = out
            if self.rnn_dropout > 0:
                inp = nn.Dropout(self.rnn_dropout)(inp, deterministic=deterministic)
            fwd = SRULayer(self.hidden_dim, self.use_relu,
                           name=f"l{layer}_fwd")(inp, mask)
            if self.bidirectional:
                rev_in = reverse_padded(inp, lengths)
                bwd = SRULayer(self.hidden_dim, self.use_relu,
                               name=f"l{layer}_bwd")(rev_in, mask)
                bwd = reverse_padded(bwd, lengths) * mask
                out = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                out = fwd
            if self.dropout > 0 and layer < self.num_layers - 1:
                out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out
