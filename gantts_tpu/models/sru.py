"""SRU (Simple Recurrent Unit) — the default TTS generator, as a parallel scan.

The reference imports the CUDA-only fused kernel ``cuda_functional.SRU``
(models.py:144-154; Lei et al. 2017) — the one RNN in the zoo whose
recurrence is *elementwise*:

    c_t = f_t * c_{t-1} + (1 - f_t) * x~_t
    h_t = r_t * g(c_t) + (1 - r_t) * x'_t        (highway bypass)

Elementwise recurrences are exactly the shape TPUs like: all input
projections (x~, f, r, highway) are ONE big MXU matmul over the whole
(B, T) block (bf16 in the production config, models/common.py matmul_cast),
and everything else — gate sigmoids, length masking, the c_t recurrence and
the highway combine — runs as ONE fused Pallas kernel per direction
(kernels/sru_scan.py fused_sru_layer) that reads the pre-activations once
from HBM and writes h once, with the carry living in VMEM.

Layout: the stack is TIME-MAJOR internally ((T, B, D)); the batch-major
input is transposed once on entry and once on exit.  The backward direction
is a *reverse-traversal* of the same kernel (index maps run the grid
right-to-left), so bidirectionality costs no flip/gather materialization.

Masking: padded steps use f_t = 1, input contribution 0, so the state is
carried through unchanged and outputs past the length are zeroed.

Fallbacks (CPU tests, or layers with D == H where the highway bypass reads
the raw input): a pure-JAX composition over ``jax.lax.associative_scan``
(Blelloch parallel scan, O(log T) depth) with time flips for the backward
direction — numerically equivalent, equivalence-tested in tests/.

Config surface matches the reference (hparams.py:111-122, 211-222):
``use_relu`` selects g = relu (else tanh), ``rnn_dropout`` is applied to the
layer input, ``dropout`` between layers, ``bidirectional`` concatenates an
independent reversed-direction unit.

Dropout is VARIATIONAL (one (B, D) mask per application, shared across all
timesteps), matching the reference's SRU implementation
(cuda_functional.SRU draws ``get_dropout_mask_((batch, dim))`` and expands
it over time for both ``rnn_dropout`` and the inter-layer ``dropout``) —
unlike torch's per-element nn.Dropout used by the LSTM family.  On TPU this
is also ~T x cheaper rng (the per-timestep masks were ~109M rng draws per
step at the bench shape, a measurable slice of the fused step's glue time).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from gantts_tpu.models.common import (
    default_lengths,
    matmul_cast,
    pad_rnn_stack,
    torch_uniform_init,
)


def linear_recurrence(f, b, axis=1):
    """c_t = f_t * c_{t-1} + b_t with c_0 = 0, via parallel scan.

    The pair (f, b) composes associatively:
      (f2, b2) o (f1, b1) = (f1*f2, f2*b1 + b2).
    """
    def combine(left, right):
        f1, b1 = left
        f2, b2 = right
        return f1 * f2, f2 * b1 + b2

    _, c = jax.lax.associative_scan(combine, (f, b), axis=axis)
    return c


def dispatch_linear_recurrence(f, b):
    """(B, T, H) linear recurrence: Pallas grid-scan on TPU, associative
    scan elsewhere.  Used by SRULayer's non-fused (k==3) fallback."""
    from gantts_tpu import kernels

    if kernels.default_use_pallas():
        return kernels.linear_recurrence_pallas(f, b)
    return linear_recurrence(f, b, axis=1)


class SRULayer(nn.Module):
    """One direction of one SRU layer, time-major: (T, B, D) -> (T, B, H).

    ``reverse=True`` runs the recurrence right-to-left (the backward
    direction of a bidirectional stack) without materializing any flip.
    """

    hidden_dim: int
    use_relu: int = 0
    compute_dtype: str = "float32"
    reverse: bool = False

    @nn.compact
    def __call__(self, x, lengths):
        T, B, D = x.shape
        H = self.hidden_dim
        bound = 1.0 / (H ** 0.5)
        init = torch_uniform_init(bound)
        # k=3 projection blocks (x~, f, r); +1 highway projection if D != H.
        k = 3 if D == H else 4
        w = self.param("w", init, (D, k * H))
        bf = self.param("bf", init, (H,))
        br = self.param("br", init, (H,))

        from gantts_tpu import kernels

        if k == 4 and kernels.default_use_pallas():
            zeros = jnp.zeros_like(bf)
            bias4 = jnp.concatenate([zeros, bf, br, zeros])
            if kernels.sru_proj_feasible(B, D, H, self.compute_dtype):
                # Fully fused: the input projection runs INSIDE the kernel
                # (W resident in VMEM, per-chunk MXU matmul; dx/dW in-kernel
                # on the backward) — u/du never exist in HBM.
                return kernels.fused_sru_proj_layer(
                    x, w, lengths, bias4=bias4, reverse=self.reverse,
                    use_relu=self.use_relu,
                    compute_dtype=self.compute_dtype)
            # Oversized D x H: external projection + u-based fused kernel.
            u = matmul_cast(x, w, self.compute_dtype)
            cd = jnp.dtype(self.compute_dtype)
            if cd == jnp.bfloat16:
                # bf16 kernel I/O halves the dominant HBM traffic (u in, du
                # out) and doubles the feasible scan chunk; the kernel's
                # internal math and recurrence state remain f32.  The bias
                # add and its gradient live inside the kernel.
                u = u.astype(cd)
            return kernels.fused_sru_layer(
                u, lengths, bias4=bias4, reverse=self.reverse,
                use_relu=self.use_relu)

        # Single MXU matmul for the whole block (bf16 in the production
        # config, f32 accumulation); everything downstream is the scan
        # fallback, all f32.
        u = matmul_cast(x, w, self.compute_dtype)

        # ---- fallback: pure-JAX composition (flips for reverse) ----------
        mask = (jnp.arange(T)[:, None] < lengths[None, :]).astype(x.dtype)
        mask = mask[:, :, None]
        if self.reverse:
            u = jnp.flip(u, axis=0)
            mask_d = jnp.flip(mask, axis=0)
        else:
            mask_d = mask
        x_tilde = u[..., :H]
        f = jax.nn.sigmoid(u[..., H:2 * H] + bf)
        r = jax.nn.sigmoid(u[..., 2 * H:3 * H] + br)
        x_prime = (jnp.flip(x, 0) if self.reverse else x) if k == 3 \
            else u[..., 3 * H:]

        f_m = f * mask_d + (1.0 - mask_d)       # f -> 1 on padding
        b_m = (1.0 - f) * x_tilde * mask_d      # input contribution -> 0
        # Pallas grid-scan on TPU (batch-major wrapper), associative scan
        # elsewhere — this k==3 path has no fused kernel.
        c = jnp.swapaxes(
            dispatch_linear_recurrence(jnp.swapaxes(f_m, 0, 1),
                                       jnp.swapaxes(b_m, 0, 1)), 0, 1)

        g = jax.nn.relu if self.use_relu else jnp.tanh
        h = (r * g(c) + (1.0 - r) * x_prime) * mask_d
        return jnp.flip(h, axis=0) if self.reverse else h


class SRU(nn.Module):
    """Multi-layer (bi)SRU matching the cuda_functional.SRU surface."""

    hidden_dim: int
    num_layers: int
    bidirectional: bool = False
    dropout: float = 0.0        # between layers
    rnn_dropout: float = 0.0    # on each layer's input
    use_relu: int = 0
    compute_dtype: str = "float32"

    def _vdrop(self, x, rate, deterministic):
        """Variational dropout on a time-major (T, B, D) block: ONE
        (B, D) Bernoulli mask shared across all timesteps (the reference
        SRU's get_dropout_mask_((batch, dim)).expand_as(x) semantics)."""
        if deterministic or rate <= 0.0:
            return x
        keep = 1.0 - rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (1,) + x.shape[1:])
        return x * (mask.astype(x.dtype) / keep)

    @nn.compact
    def __call__(self, x, lengths=None, deterministic=True):
        lengths = default_lengths(x, lengths)
        # Time-major through the whole stack: one transpose in, one out.
        # Tile-pad ONCE for the whole stack (pad_rnn_stack) so the fused
        # kernels' per-layer pad/slice copies are no-ops.
        out = jnp.swapaxes(x, 0, 1)
        out, lengths, (T0, B0) = pad_rnn_stack(out, lengths)
        for layer in range(self.num_layers):
            inp = self._vdrop(out, self.rnn_dropout, deterministic)
            fwd = SRULayer(self.hidden_dim, self.use_relu, self.compute_dtype,
                           name=f"l{layer}_fwd")(inp, lengths)
            if self.bidirectional:
                bwd = SRULayer(self.hidden_dim, self.use_relu,
                               self.compute_dtype, reverse=True,
                               name=f"l{layer}_bwd")(inp, lengths)
                out = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                out = fwd
            if self.dropout > 0 and layer < self.num_layers - 1:
                out = self._vdrop(out, self.dropout, deterministic)
        return jnp.swapaxes(out[:T0, :B0], 0, 1)
