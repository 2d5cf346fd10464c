"""Inference / synthesis chains for VC and TTS.

Programmatic API behind the ``evaluation_vc.py`` / ``evaluation_tts.py``
CLIs, mirroring the reference functions:

  vc_from_waveform     <- test_vc_from_path   (evaluation_vc.py:40-110)
  gen_parameters       <- gen_parameters      (evaluation_tts.py:51-100)
  gen_waveform         <- gen_waveform        (evaluation_tts.py:103-130)
  gen_duration         <- gen_duration        (evaluation_tts.py:143-179)
  tts_from_label       <- tts_from_label      (evaluation_tts.py:182-225)

Device work (model forward + unit-variance MLPG) is jitted with
bucket-padded lengths so repeated utterances reuse compilations; vocoder
work (WORLD/SPTK chains) runs host-side in float64.

Consciously fixed reference quirk (documented in SURVEY.md section 3.2):
the reference builds the acoustic model's generator noise input with the
*duration* model's hparams (``_generator_input(hp_duration, x)``,
evaluation_tts.py:219); here each model uses its own bundle.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from gantts_tpu import preprocessing as P
from gantts_tpu.core.paramgen import multi_stream_mlpg
from gantts_tpu.core.windows import mlpg, unit_variance_mlpg_matrix
from gantts_tpu.data import round_up
from gantts_tpu.frontend import sptk, world
from gantts_tpu.models import include_parameter_generation
from gantts_tpu.postfilters import merlin_post_filter


class JittedForward:
    """Bucket-padded, cached-compile single-utterance forward.

    In2Out models (``needs_R=True``) apply MLPG *inside* the model; naive
    zero-padding would distort the static trajectory near each utterance's
    end (MLPG is a global banded solve — measured ~8%% relative tail error),
    while exact-length computation recompiles per distinct length.  Instead
    the model receives a ``core.fast_mlpg.MLPGStencil`` in place of the
    dense R: the stencil operator handles any padded length in one compiled
    program and places its exact boundary rows at the TRUE length with
    dynamic slices.  For utterances too short for the stencil
    (< 4*halfwidth+2 frames) the exact dense R at true length is used.
    Generic models are bucket-padded — their padded outputs are masked zeros
    and are trimmed before the external MLPG.
    """

    def __init__(self, model, variables, hp, needs_R):
        from gantts_tpu.core.fast_mlpg import DEFAULT_HALFWIDTH, MLPGStencil

        self.model = model
        self.variables = variables
        self.hp = hp
        self.needs_R = needs_R
        self._min_stencil_T = 4 * DEFAULT_HALFWIDTH + 2
        if needs_R:
            self._stencil = MLPGStencil.create(hp.windows)
            self._fn = jax.jit(lambda v, x, R, lengths: model.apply(
                v, x, R, lengths, deterministic=True))
        else:
            self._fn = jax.jit(lambda v, x, lengths: model.apply(
                v, x, lengths, deterministic=True))
        self._r_cache = {}

    def _R(self, T):
        if T not in self._r_cache:
            self._r_cache[T] = jnp.asarray(
                unit_variance_mlpg_matrix(self.hp.windows, T))
        return self._r_cache[T]

    def __call__(self, x):
        """x: (T, D) float32 -> model output(s) trimmed back to T."""
        T = x.shape[0]
        use_stencil = self.needs_R and T >= self._min_stencil_T
        if self.needs_R and not use_stencil:
            T_pad = T  # short utterance: exact dense R at true length
        else:
            T_pad = round_up(T, getattr(self.hp, "batch_bucket_multiple", 32))
        xp = np.zeros((1, T_pad, x.shape[1]), np.float32)
        xp[0, :T] = x
        lengths = jnp.asarray([T], jnp.int32)
        if self.needs_R:
            R = self._stencil if use_stencil else self._R(T_pad)
            out = self._fn(self.variables, jnp.asarray(xp), R, lengths)
        else:
            out = self._fn(self.variables, jnp.asarray(xp), lengths)
        if isinstance(out, tuple):
            return tuple(np.asarray(o)[0, :T] for o in out)
        return np.asarray(out)[0, :T]


# One JittedForward per (model, variables) so repeated utterances reuse the
# jit trace cache instead of recompiling per call site (models/variables are
# compared by identity; CLI lifetimes keep them alive).
_FWD_CACHE = {}


def get_jitted_forward(model, variables, hp, needs_R):
    key = (id(model), id(variables), bool(needs_R))
    hit = _FWD_CACHE.get(key)
    if hit is not None and hit.model is model and hit.variables is variables:
        return hit
    fwd = JittedForward(model, variables, hp, needs_R)
    _FWD_CACHE[key] = fwd
    return fwd


def apply_vc_model(model, variables, mc_scaled, hp):
    """Both generator protocols on one normalized utterance
    (evaluation_vc.py:74-83)."""
    if include_parameter_generation(model):
        fwd = get_jitted_forward(model, variables, hp, needs_R=True)
        _, y_hat_static = fwd(mc_scaled)
        return np.asarray(y_hat_static)
    fwd = get_jitted_forward(model, variables, hp, needs_R=False)
    y_hat = fwd(mc_scaled)
    T = y_hat.shape[0]
    R = jnp.asarray(unit_variance_mlpg_matrix(hp.windows, T))
    y_hat_static = multi_stream_mlpg(
        jnp.asarray(y_hat)[None], R, tuple(hp.stream_sizes),
        tuple(hp.has_dynamic_features))
    return np.asarray(y_hat_static)[0]


def vc_from_waveform(model, variables, x, fs, data_mean, data_std, hp,
                     diffvc=True):
    """Full VC chain on one waveform (evaluation_vc.py:40-110).

    Returns (waveform, inputs, outputs): converted audio plus the source and
    predicted static mel-cepstra (for analysis, as the reference returns)."""
    hop_length = int(fs * (hp.frame_period * 0.001))
    x = np.asarray(x, dtype=np.float64)
    f0, timeaxis = world.dio(x, fs, frame_period=hp.frame_period)
    f0 = world.stonemask(x, f0, timeaxis, fs)
    spectrogram = world.cheaptrick(x, f0, timeaxis, fs)
    aperiodicity = world.d4c(x, f0, timeaxis, fs)
    alpha = sptk.mcepalpha(fs)
    mc = sptk.sp2mc(spectrogram, order=hp.order, alpha=alpha)
    c0, mc = mc[:, 0], mc[:, 1:]
    static_dim = mc.shape[-1]
    mc = P.modspec_smoothing(mc, fs / hop_length, cutoff=50)
    mc = P.delta_features(mc, hp.windows).astype(np.float32)

    inputs = mc[:, :static_dim].copy()

    mc_scaled = P.scale(mc, data_mean, data_std).astype(np.float32)
    mc_static_pred = apply_vc_model(model, variables, mc_scaled, hp)
    mc_static_pred = P.inv_scale(
        mc_static_pred.astype(np.float64),
        data_mean[:static_dim], data_std[:static_dim])
    outputs = mc_static_pred.copy()

    if diffvc:
        mc_static_pred = mc_static_pred - mc[:, :static_dim]

    mc_full = np.hstack((c0[:, None], mc_static_pred))
    if diffvc:
        mc_full[:, 0] = 0  # remove power coefficient (evaluation_vc.py:96)
        b = sptk.mc2b(mc_full.astype(np.float64), alpha=alpha)
        waveform = sptk.mlsa_synthesis(x, b, alpha, hopsize=hop_length)
    else:
        fftlen = world.get_cheaptrick_fft_size(fs)
        spectrogram = sptk.mc2sp(
            mc_full.astype(np.float64), alpha=alpha, fftlen=fftlen)
        waveform = world.synthesize(
            f0, spectrogram, aperiodicity, fs, hp.frame_period)

    return waveform, inputs, outputs


# ---------------------------------------------------------------------------
# TTS
# ---------------------------------------------------------------------------

def gen_parameters(y_predicted, Y_mean, Y_std, hp_acoustic,
                   mge_training=True):
    """Per-stream MLPG + denormalization (evaluation_tts.py:51-100).

    mge_training=True: MLPG with unit variances on NORMALIZED features, then
    denormalize (matching MGE-trained models); else denormalize first and use
    the true training variances."""
    hp = hp_acoustic
    mgc_dim, lf0_dim, vuv_dim, bap_dim = hp.stream_sizes
    lf0_start = mgc_dim
    vuv_start = lf0_start + lf0_dim
    bap_start = vuv_start + vuv_dim
    windows = hp.windows
    K = len(windows)

    if mge_training:
        mgc = mlpg(y_predicted[:, :lf0_start], np.ones(mgc_dim), windows)
        lf0 = mlpg(y_predicted[:, lf0_start:vuv_start], np.ones(lf0_dim),
                   windows)
        vuv = y_predicted[:, vuv_start]
        bap = mlpg(y_predicted[:, bap_start:], np.ones(bap_dim), windows)

        mgc = P.inv_scale(mgc, Y_mean[:mgc_dim // K], Y_std[:mgc_dim // K])
        lf0 = P.inv_scale(lf0, Y_mean[lf0_start:lf0_start + lf0_dim // K],
                          Y_std[lf0_start:lf0_start + lf0_dim // K])
        bap = P.inv_scale(bap, Y_mean[bap_start:bap_start + bap_dim // K],
                          Y_std[bap_start:bap_start + bap_dim // K])
        vuv = P.inv_scale(vuv, Y_mean[vuv_start], Y_std[vuv_start])
    else:
        y = P.inv_scale(y_predicted, Y_mean, Y_std)
        Y_var = Y_std * Y_std
        mgc = mlpg(y[:, :lf0_start], Y_var[:lf0_start], windows)
        lf0 = mlpg(y[:, lf0_start:vuv_start], Y_var[lf0_start:vuv_start],
                   windows)
        vuv = y[:, vuv_start]
        bap = mlpg(y[:, bap_start:], Y_var[bap_start:], windows)

    return mgc, lf0, vuv, bap


def gen_waveform(y_predicted, Y_mean, Y_std, hp_acoustic, post_filter=False,
                 coef=1.4, fs=16000, mge_training=True):
    """Predicted acoustic features -> waveform (evaluation_tts.py:103-130)."""
    alpha = sptk.mcepalpha(fs)
    fftlen = world.get_cheaptrick_fft_size(fs)
    frame_period = hp_acoustic.frame_period

    mgc, lf0, vuv, bap = gen_parameters(
        y_predicted, Y_mean, Y_std, hp_acoustic, mge_training)

    if post_filter:
        mgc = merlin_post_filter(mgc, alpha, coef=coef)

    spectrogram = sptk.mc2sp(mgc, alpha=alpha, fftlen=fftlen)
    aperiodicity = world.decode_aperiodicity(
        bap.astype(np.float64), fs, fftlen)
    f0 = lf0.copy().reshape(-1)
    vuv_flat = np.asarray(vuv).reshape(-1)
    f0[vuv_flat < 0.5] = 0
    nz = np.nonzero(f0)
    f0[nz] = np.exp(f0[nz])

    generated = world.synthesize(
        f0.astype(np.float64), spectrogram.astype(np.float64),
        aperiodicity.astype(np.float64), fs, frame_period)
    generated = generated / np.max(np.abs(generated)) * 32767  # int16 range

    return generated, mgc, lf0, vuv, bap


def generator_input(hp, x, rs=None):
    """Optional noise concatenation (evaluation_tts.py:133-140)."""
    if hp.generator_add_noise:
        rs = rs or np.random.RandomState(1234)
        z = rs.rand(x.shape[0], hp.generator_noise_dim).astype(np.float32)
        return np.concatenate([x, z], axis=-1)
    return x


def gen_duration(label_path, duration_model, duration_variables,
                 X_min, X_max, Y_mean, Y_std, hp_duration,
                 binary_dict, continuous_dict):
    """Duration prediction written back into the labels
    (evaluation_tts.py:143-179)."""
    from gantts_tpu.io import hts, merlin

    hts_labels = hts.load(label_path)
    feats = merlin.linguistic_features(
        hts_labels, binary_dict, continuous_dict,
        add_frame_features=hp_duration.add_frame_features,
        subphone_features=hp_duration.subphone_features).astype(np.float32)

    feats = P.minmax_scale(feats, X_min, X_max, feature_range=(0.01, 0.99))
    feats = generator_input(hp_duration, feats.astype(np.float32))

    fwd = get_jitted_forward(duration_model, duration_variables, hp_duration,
                             needs_R=False)
    pred = fwd(feats.astype(np.float32))
    pred = P.inv_scale(pred.astype(np.float64), Y_mean, Y_std)
    pred = np.round(pred)
    pred[pred <= 0] = 1
    # state-aligned labels carry one duration per state line
    if hts_labels.is_state_alignment:
        durations = pred.reshape(-1)
    else:
        durations = pred.sum(axis=-1)
    hts_labels.set_durations(durations)
    return hts_labels


def tts_from_label(models, variables, label_path, X_min, X_max, Y_mean,
                   Y_std, hp_duration, hp_acoustic, binary_dict,
                   continuous_dict, post_filter=False,
                   apply_duration_model=True, coef=1.4, fs=16000,
                   mge_training=True):
    """Two-stage TTS synthesis (evaluation_tts.py:182-225)."""
    from gantts_tpu.io import hts, merlin

    if apply_duration_model:
        labels = gen_duration(
            label_path, models["duration"], variables["duration"],
            X_min["duration"], X_max["duration"], Y_mean["duration"],
            Y_std["duration"], hp_duration, binary_dict, continuous_dict)
    else:
        labels = hts.load(label_path)

    feats = merlin.linguistic_features(
        labels, binary_dict, continuous_dict,
        add_frame_features=hp_acoustic.add_frame_features,
        subphone_features=hp_acoustic.subphone_features)
    indices = labels.silence_frame_indices()
    feats = np.delete(feats, indices[indices < len(feats)], axis=0)

    feats = P.minmax_scale(feats, X_min["acoustic"], X_max["acoustic"],
                           feature_range=(0.01, 0.99)).astype(np.float32)
    feats = generator_input(hp_acoustic, feats)

    fwd = get_jitted_forward(models["acoustic"], variables["acoustic"],
                             hp_acoustic, needs_R=False)
    acoustic_predicted = fwd(feats)

    return gen_waveform(acoustic_predicted.astype(np.float64),
                        Y_mean["acoustic"], Y_std["acoustic"], hp_acoustic,
                        post_filter, coef=coef, fs=fs,
                        mge_training=mge_training)
