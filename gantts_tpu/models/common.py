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


def _make_matmul_bf16(x_out_bf16):
    """custom-vjp bf16 matmul with f32 accumulation.

    The cotangent is cast to bf16 so BOTH backward matmuls (dgrad and
    wgrad) also run on the bf16 MXU path — without this they silently
    promote to f32 (f32 cotangent x bf16 operand) and the backward pass
    stays at f32 throughput.  ``x_out_bf16`` statically selects the dx
    dtype to match the primal x (the weight cotangent is always f32)."""

    @jax.custom_vjp
    def mm(x, w):
        return jnp.matmul(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    def fwd(x, w):
        x16 = x.astype(jnp.bfloat16)
        w16 = w.astype(jnp.bfloat16)
        y = jnp.matmul(x16, w16, preferred_element_type=jnp.float32)
        return y, (x16, w16)

    def bwd(res, g):
        x16, w16 = res
        g16 = g.astype(jnp.bfloat16)
        dx = jnp.matmul(g16, jnp.swapaxes(w16, -1, -2),
                        preferred_element_type=jnp.float32)
        # wgrad sums over all leading (batch/time) axes: reshape to 2-D.
        k = w16.shape[-2]
        x2 = x16.reshape(-1, k)
        g2 = g16.reshape(-1, g16.shape[-1])
        dw = jnp.matmul(x2.T, g2, preferred_element_type=jnp.float32)
        if x_out_bf16:
            dx = dx.astype(jnp.bfloat16)
        return dx, dw.astype(jnp.float32)

    mm.defvjp(fwd, bwd)
    return mm


_matmul_bf16 = _make_matmul_bf16(x_out_bf16=False)
_matmul_bf16_x16 = _make_matmul_bf16(x_out_bf16=True)


def matmul_cast(x, w, compute_dtype="float32"):
    """MXU matmul in ``compute_dtype`` with float32 accumulation/output.

    On v5e a bfloat16 matmul has ~4x the f32 MXU throughput and halves the
    operand HBM traffic; ``preferred_element_type=float32`` keeps the
    accumulator (and the returned array) in f32, so downstream elementwise
    math and reductions are unaffected.  The custom VJP keeps the backward
    matmuls on the bf16 path too (cotangents cast to bf16).  f32 stays the
    default — parity bundles keep exact reference numerics; the TPU
    production config opts in via the ``compute_dtype`` hparam (MLPG is
    exempt and always runs f32 HIGHEST, core/paramgen.py).
    """
    cd = jnp.dtype(compute_dtype)
    if cd == jnp.float32:
        return x @ w
    if cd == jnp.bfloat16:
        if x.dtype == jnp.bfloat16:
            return _matmul_bf16_x16(x, w)
        return _matmul_bf16(x, w)
    return jnp.matmul(x.astype(cd), w.astype(cd),
                      preferred_element_type=jnp.float32)


class TorchLinear(nn.Module):
    """Linear layer with torch nn.Linear's default init.

    ``compute_dtype``: matmul precision via ``matmul_cast`` (params stay
    f32, accumulation/bias add/output in f32, custom VJP keeps the backward
    matmuls on the bf16 path) — the same contract as the RNN projections."""

    features: int
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = 1.0 / (fan_in ** 0.5)
        kernel = self.param("kernel", torch_uniform_init(bound),
                            (fan_in, self.features))
        bias = self.param("bias", torch_uniform_init(bound),
                          (self.features,))
        y = matmul_cast(x, kernel, self.compute_dtype)
        return y.astype(jnp.float32) + bias


def leaky_relu(x):
    """torch.nn.LeakyReLU default negative_slope=0.01 (models.py:37)."""
    return jax.nn.leaky_relu(x, negative_slope=0.01)


def default_lengths(x, lengths):
    if lengths is None:
        B, T = x.shape[0], x.shape[1]
        return jnp.full((B,), T, dtype=jnp.int32)
    return lengths.astype(jnp.int32)


def pad_rnn_stack(x_tm, lengths):
    """Pad a time-major RNN-stack input ONCE for the whole stack.

    Every fused-kernel wrapper (kernels/{sru,lstm}_scan.py) pads its inputs
    to TPU tiles (B to 8, T to the max scan chunk) and slices its output
    back — a pad + slice copy pair over HBM at EVERY layer boundary.
    Padding once here makes all of those per-layer pads/slices no-ops
    (measured as `copy` ops in the round-4 device trace).  D is NOT padded:
    the SRU's highway parameterization switches on the raw ``D == H``
    (models/sru.py), so the feature dim must reach the layer untouched.

    Padded batch rows carry length 0, so every masked layer emits zeros for
    them; padded time steps lie past every row's length.  Returns the
    padded (T, B, D) array, the padded lengths, and the original (T, B) to
    slice the stack output back.
    """
    from gantts_tpu.kernels.sru_scan import _FUSED_MAX_CHUNK

    T, B, D = x_tm.shape
    Tp = -(-T // _FUSED_MAX_CHUNK) * _FUSED_MAX_CHUNK
    Bp = -(-B // 8) * 8
    lengths = jnp.asarray(lengths, jnp.int32)
    if (Tp, Bp) != (T, B):
        x_tm = jnp.pad(x_tm, ((0, Tp - T), (0, Bp - B), (0, 0)))
        lengths = jnp.pad(lengths, (0, Bp - B))
    return x_tm, lengths, (T, B)
