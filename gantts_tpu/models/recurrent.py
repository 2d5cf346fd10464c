"""Recurrent trunks: masked multi-layer (bi)LSTM via lax.scan.

TPU-native replacement for the reference's cuDNN ``nn.LSTM`` +
``pack_padded_sequence`` stack (models.py:84, 100-112, 175, 184-187, 198,
207-210).  Packing has no TPU analog; instead sequences stay padded to a
bucketed static length and the recurrence is masked:

  * carries freeze once t >= length (so final states match packing),
  * outputs are zeroed past the length (matching ``pad_packed_sequence``).

Performance notes (XLA/MXU):
  * the input projection for ALL timesteps is hoisted out of the scan as one
    big (B*T, in) x (in, 4H) matmul — only the (B, H) x (H, 4H) recurrent
    matmul stays inside the scan body;
  * weights are stored (in, 4H) so the scan-body matmul is MXU-shaped;
  * the time loop is a single ``lax.scan`` per layer/direction — no Python
    unrolling, compile time stays flat in T.
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


class LSTMLayer(nn.Module):
    """Single-direction masked LSTM layer (torch gate order i, f, g, o).

    On TPU the recurrence runs as the fused Pallas kernel
    (kernels/lstm_scan.py): recurrent matmul on the MXU with W_hh resident
    in VMEM, in-kernel masking/bias, reverse direction via index maps (no
    flip materialization).  Elsewhere the ``lax.scan`` below is the kernel's
    numerical oracle (pinned in tests/test_kernels.py)."""

    hidden_dim: int
    compute_dtype: str = "float32"
    reverse: bool = False
    time_major: bool = False  # x is (T, B, D); outputs (T, B, H)

    @nn.compact
    def __call__(self, x, lengths, return_params=False):
        if self.time_major:
            T, B, D = x.shape
        else:
            B, T, D = x.shape
        H = self.hidden_dim
        bound = 1.0 / (H ** 0.5)
        init = torch_uniform_init(bound)
        w_ih = self.param("w_ih", init, (D, 4 * H))
        w_hh = self.param("w_hh", init, (H, 4 * H))
        # torch keeps two bias vectors (b_ih + b_hh); functionally one sum,
        # but two draws changes the init distribution — keep both.
        b_ih = self.param("b_ih", init, (4 * H,))
        b_hh = self.param("b_hh", init, (4 * H,))
        if return_params:
            # parameter-declaration-only call: the parent runs the compute
            # (StackedLSTM's fused bidirectional kernel takes both
            # directions' params while the checkpointed param tree keeps
            # its l{N}_{fwd,bwd} layout)
            return dict(w_ih=w_ih, w_hh=w_hh, bias=b_ih + b_hh)
        cd = jnp.dtype(self.compute_dtype)

        from gantts_tpu import kernels
        from gantts_tpu.kernels import lstm_scan

        if kernels.default_use_pallas() and lstm_scan.lstm_proj_feasible(
                B, D, H, cd):
            # Fully fused forward: the input projection runs INSIDE the
            # kernel (W_ih resident in VMEM next to W_hh); backward = the
            # pinned BPTT kernel + XLA dx/dW_ih matmuls.
            x_tm = x if self.time_major else jnp.swapaxes(x, 0, 1)
            y = kernels.fused_lstm_proj_layer(
                x_tm, w_ih, w_hh, b_ih + b_hh, lengths,
                reverse=self.reverse, compute_dtype=self.compute_dtype)
            return y if self.time_major else jnp.swapaxes(y, 0, 1)

        # (B/T, T/B, 4H), hoisted out of the recurrence (one MXU matmul)
        xp = matmul_cast(x, w_ih, self.compute_dtype)

        if kernels.default_use_pallas() and lstm_scan.kernel_feasible(
                B, H, cd):
            # Oversized D x H for the resident W_ih: external projection
            # + the xp-based fused recurrence kernel.
            xp_tm = xp if self.time_major else jnp.swapaxes(xp, 0, 1)
            if cd == jnp.bfloat16:
                # bf16 kernel I/O (xp in, h out, dxp out) halves the
                # dominant HBM traffic; in-kernel math and carries are f32
                xp_tm = xp_tm.astype(cd)
            y = kernels.fused_lstm_layer(xp_tm, w_hh, b_ih + b_hh, lengths,
                                         reverse=self.reverse)
            return y if self.time_major else jnp.swapaxes(y, 0, 1)

        # ---- fallback: masked lax.scan (flips for reverse), batch-major ---
        if self.time_major:
            x = jnp.swapaxes(x, 0, 1)
            xp = jnp.swapaxes(xp, 0, 1)
        mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(x.dtype)
        mask = mask[:, :, None]
        xp = xp + (b_ih + b_hh)
        if self.reverse:
            xp = jnp.flip(xp, axis=1)
            mask = jnp.flip(mask, axis=1)
        w_hh_c = w_hh.astype(cd)  # cast once, reused every scan step

        def step(carry, inputs):
            h, c = carry
            xp_t, m_t = inputs  # (B, 4H), (B, 1)
            gates = xp_t + jnp.matmul(h.astype(cd), w_hh_c,
                                      preferred_element_type=jnp.float32)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            h = m_t * h_new + (1.0 - m_t) * h
            c = m_t * c_new + (1.0 - m_t) * c
            return (h, c), h_new * m_t

        h0 = jnp.zeros((B, H), x.dtype)
        c0 = jnp.zeros((B, H), x.dtype)
        xp_tm = jnp.swapaxes(xp, 0, 1)      # (T, B, 4H)
        m_tm = jnp.swapaxes(mask, 0, 1)     # (T, B, 1)
        (_, _), ys = jax.lax.scan(step, (h0, c0), (xp_tm, m_tm))
        ys = jnp.swapaxes(ys, 0, 1)         # (B, T, H)
        ys = jnp.flip(ys, axis=1) if self.reverse else ys
        return jnp.swapaxes(ys, 0, 1) if self.time_major else ys


class StackedLSTM(nn.Module):
    """Multi-layer (bi)LSTM with torch-style inter-layer dropout."""

    hidden_dim: int
    num_layers: int
    bidirectional: bool = False
    dropout: float = 0.0
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, lengths=None, deterministic=True):
        lengths = default_lengths(x, lengths)
        # Time-major through the whole stack (one transpose in, one out —
        # the per-layer swaps the batch-major stack needed showed up as
        # `copy` ops in the round-3 device trace).
        out = jnp.swapaxes(x, 0, 1)
        # Tile-pad ONCE for the whole stack (pad_rnn_stack) so the fused
        # kernels' per-layer pad/slice copies are no-ops.
        out, lengths, (T0, B0) = pad_rnn_stack(out, lengths)
        from gantts_tpu import kernels
        from gantts_tpu.kernels import lstm_scan

        for layer in range(self.num_layers):
            if (self.bidirectional and kernels.default_use_pallas()
                    and lstm_scan.bilstm_proj_feasible(
                        out.shape[1], out.shape[2], self.hidden_dim,
                        jnp.dtype(self.compute_dtype))):
                # Both directions fused into ONE kernel: the two
                # independent recurrences interleave in the grid body so
                # one direction's MXU matmul overlaps the other's VPU gate
                # math (kernels/lstm_scan.py bidirectional section).  The
                # child layers only declare their params here — the param
                # tree (and checkpoints) keep the l{N}_{fwd,bwd} layout.
                pf = LSTMLayer(self.hidden_dim, self.compute_dtype,
                               time_major=True,
                               name=f"l{layer}_fwd")(
                    out, lengths, return_params=True)
                pb = LSTMLayer(self.hidden_dim, self.compute_dtype,
                               reverse=True, time_major=True,
                               name=f"l{layer}_bwd")(
                    out, lengths, return_params=True)
                yf, yb = kernels.fused_bilstm_proj_layer(
                    out, pf, pb, lengths,
                    compute_dtype=self.compute_dtype)
                out = jnp.concatenate([yf, yb], axis=-1)
                if self.dropout > 0 and layer < self.num_layers - 1:
                    out = nn.Dropout(self.dropout)(
                        out, deterministic=deterministic)
                continue
            fwd = LSTMLayer(self.hidden_dim, self.compute_dtype,
                            time_major=True,
                            name=f"l{layer}_fwd")(out, lengths)
            if self.bidirectional:
                # reverse direction handled inside the layer (index maps on
                # TPU, flips in the scan fallback); leading padding is inert
                # because the masked recurrence freezes the (zero) carry.
                bwd = LSTMLayer(self.hidden_dim, self.compute_dtype,
                                reverse=True, time_major=True,
                                name=f"l{layer}_bwd")(out, lengths)
                out = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                out = fwd
            if self.dropout > 0 and layer < self.num_layers - 1:
                out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return jnp.swapaxes(out[:T0, :B0], 0, 1)
