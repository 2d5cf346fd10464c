"""Model zoo — the six generator/discriminator architectures of the reference
(gantts/models.py:21-213) as Flax modules behind the same string-keyed
registry and duck-typed interface.

Two generator protocols, switched on ``include_parameter_generation``
(reference models.py:11-18, train.py:336-355):

  * In2Out protocol (returns (x, x_static + T(x)*G(x)), MLPG applied INSIDE
    the model): ``In2OutHighwayNet``, ``In2OutRNNHighwayNet`` — call as
    ``model.apply(vars, x, R, lengths)``.
  * Generic protocol (returns static+delta prediction; the trainer applies
    ``multi_stream_mlpg`` externally): ``MLP``, ``SRURNN``, ``GRURNN``,
    ``LSTMRNN`` — call as ``model.apply(vars, x, lengths)``.

All modules take ``deterministic`` (dropout off for eval/test phase) and a
``dropout`` rng when training.  Construction is reflective by name exactly
like the reference (train.py:773-774): ``create_model(hp.generator,
**hp.generator_params)``.

Preserved reference quirks (documented, not accidental):
  * ``GRURNN`` actually wraps an LSTM (reference models.py:175).
  * ``MLP`` accepts a dummy ``bidirectional`` kwarg (models.py:123).
  * ``In2OutHighwayNet`` reassigns ``x`` through its trunk (models.py:63-66),
    so its first return is the pre-MLPG ``last_linear`` output — with
    ``mse_w > 0`` the MSE term trains the trunk in the delta domain.  Only
    ``In2OutRNNHighwayNet`` keeps ``x`` untouched (models.py:94-118) and
    returns the *input*, making its MSE term inert.
"""

from __future__ import annotations

import flax.linen as nn

from gantts_tpu.core.paramgen import unit_variance_mlpg
from gantts_tpu.models.common import TorchLinear, leaky_relu
from gantts_tpu.models.recurrent import StackedLSTM
from gantts_tpu.models.sru import SRU


class In2OutHighwayNet(nn.Module):
    """Input-to-Output Highway Network for VC (reference models.py:21-69).

    y^ = x_static + sigmoid(T(x_static)) * MLPG(G(x)); single-stream only.
    """

    in_dim: int = 118
    out_dim: int = 118
    static_dim: int = 118 // 2
    num_hidden: int = 3
    hidden_dim: int = 512
    dropout: float = 0.5
    compute_dtype: str = "float32"

    include_parameter_generation = True

    @nn.compact
    def __call__(self, x, R, lengths=None, deterministic=True):
        if x.ndim == 2:
            x = x[None]
        x_static = x[:, :, : self.static_dim]
        Tx = nn.sigmoid(TorchLinear(self.static_dim, name="T")(x_static))
        h = x
        for i in range(self.num_hidden):
            h = TorchLinear(self.hidden_dim, self.compute_dtype,
                            name=f"H_{i}")(h)
            h = nn.Dropout(self.dropout)(leaky_relu(h),
                                         deterministic=deterministic)
        h = TorchLinear(self.out_dim, name="last_linear")(h)
        Gx = unit_variance_mlpg(R, h, lengths=lengths)
        # Reference quirk (models.py:63-69): ``x`` was reassigned through the
        # trunk, so the first return is the pre-MLPG trunk output, NOT the
        # input — the generator MSE term (mse_w) trains the trunk directly.
        return h, x_static + Tx * Gx


class In2OutRNNHighwayNet(nn.Module):
    """RNN variant of the In2Out highway net (reference models.py:72-118)."""

    in_dim: int = 118
    out_dim: int = 118
    static_dim: int = 118 // 2
    num_hidden: int = 3
    hidden_dim: int = 512
    bidirectional: bool = False
    dropout: float = 0.5
    compute_dtype: str = "float32"

    include_parameter_generation = True

    @nn.compact
    def __call__(self, x, R, lengths=None, deterministic=True):
        if x.ndim == 2:
            x = x[None]
        x_static = x[:, :, : self.static_dim]
        Tx = nn.sigmoid(TorchLinear(self.static_dim, name="T")(x_static))
        h = StackedLSTM(self.hidden_dim, self.num_hidden, self.bidirectional,
                        self.dropout, self.compute_dtype, name="lstm")(
            x, lengths, deterministic=deterministic)
        h = TorchLinear(self.out_dim, name="hidden2out")(h)
        Gx = unit_variance_mlpg(R, h, lengths=lengths)
        # Unlike the MLP variant, the reference RNN forward (models.py:94-118)
        # never reassigns ``x``: the first return IS the input, so the MSE
        # term is inert for this model.
        return x, x_static + Tx * Gx


class MLP(nn.Module):
    """Feed-forward net; doubles as the per-frame discriminator
    (reference models.py:121-141, hparams.py:56/135/231)."""

    in_dim: int = 118
    out_dim: int = 1
    num_hidden: int = 2
    hidden_dim: int = 256
    dropout: float = 0.5
    last_sigmoid: bool = True
    bidirectional: bool | None = None  # dummy, parity with reference
    compute_dtype: str = "float32"

    include_parameter_generation = False

    @nn.compact
    def __call__(self, x, lengths=None, deterministic=True):
        h = x
        for i in range(self.num_hidden):
            h = TorchLinear(self.hidden_dim, self.compute_dtype,
                            name=f"layers_{i}")(h)
            h = nn.Dropout(self.dropout)(leaky_relu(h),
                                         deterministic=deterministic)
        h = TorchLinear(self.out_dim, name="last_linear")(h)
        return nn.sigmoid(h) if self.last_sigmoid else h


class SRURNN(nn.Module):
    """SRU generator (reference models.py:145-167); see models/sru.py for the
    parallel-scan formulation replacing the CUDA kernel."""

    in_dim: int = 118
    out_dim: int = 118
    num_hidden: int = 2
    hidden_dim: int = 256
    bidirectional: bool = False
    dropout: float = 0.0
    last_sigmoid: bool = False
    use_relu: int = 0
    rnn_dropout: float = 0.0
    compute_dtype: str = "float32"

    include_parameter_generation = False

    @nn.compact
    def __call__(self, x, lengths=None, deterministic=True):
        h = SRU(self.hidden_dim, self.num_hidden, self.bidirectional,
                self.dropout, self.rnn_dropout, self.use_relu,
                self.compute_dtype, name="gru")(
            x, lengths, deterministic=deterministic)
        h = TorchLinear(self.out_dim, name="hidden2out")(h)
        return nn.sigmoid(h) if self.last_sigmoid else h


class GRURNN(nn.Module):
    """Misnamed in the reference: wraps an LSTM (models.py:170-190)."""

    in_dim: int = 118
    out_dim: int = 118
    num_hidden: int = 2
    hidden_dim: int = 256
    bidirectional: bool = False
    dropout: float = 0.0
    last_sigmoid: bool = False
    compute_dtype: str = "float32"

    include_parameter_generation = False

    @nn.compact
    def __call__(self, x, lengths=None, deterministic=True):
        h = StackedLSTM(self.hidden_dim, self.num_hidden, self.bidirectional,
                        self.dropout, self.compute_dtype, name="gru")(
            x, lengths, deterministic=deterministic)
        h = TorchLinear(self.out_dim, name="hidden2out")(h)
        return nn.sigmoid(h) if self.last_sigmoid else h


class LSTMRNN(nn.Module):
    """Packed-sequence (bi)LSTM + linear head (reference models.py:193-213)."""

    in_dim: int = 118
    out_dim: int = 118
    num_hidden: int = 2
    hidden_dim: int = 256
    bidirectional: bool = False
    dropout: float = 0.0
    last_sigmoid: bool = False
    compute_dtype: str = "float32"

    include_parameter_generation = False

    @nn.compact
    def __call__(self, x, lengths=None, deterministic=True):
        h = StackedLSTM(self.hidden_dim, self.num_hidden, self.bidirectional,
                        self.dropout, self.compute_dtype, name="lstm")(
            x, lengths, deterministic=deterministic)
        h = TorchLinear(self.out_dim, name="hidden2out")(h)
        return nn.sigmoid(h) if self.last_sigmoid else h


MODEL_REGISTRY = {
    "In2OutHighwayNet": In2OutHighwayNet,
    "In2OutRNNHighwayNet": In2OutRNNHighwayNet,
    "MLP": MLP,
    "SRURNN": SRURNN,
    "GRURNN": GRURNN,
    "LSTMRNN": LSTMRNN,
}


def create_model(name, **params):
    """Reflective construction by name (reference train.py:773-774)."""
    try:
        cls = MODEL_REGISTRY[name]
    except KeyError as e:
        raise ValueError(
            f"Unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}") from e
    return cls(**params)


def include_parameter_generation(model) -> bool:
    """Protocol switch (reference models.py:15-18, train.py:337)."""
    return bool(getattr(model, "include_parameter_generation", False))
