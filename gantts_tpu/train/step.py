"""The fused G+D training step — one jitted XLA program per (phase, shape).

This is the TPU-native re-design of the reference's per-batch body
(train.py:492-595).  Where the reference runs generator forward, a separate
discriminator backward with ``retain_graph=True``, then a generator backward
(train.py:274, 316), here the whole iteration is ONE compiled program:

  1. generator forward once, captured with ``jax.vjp`` so its backward graph
     is shared between every consumer (the "retain_graph" analog, but fused);
  2. discriminator loss/update on (real, stop-grad fake) + accuracy counts;
  3. generator losses (masked MSE + MGE + adversarial through the *updated*
     discriminator, matching the reference's update order) differentiated
     w.r.t. the generator *outputs*, then pulled back through the saved vjp —
     the generator body is executed exactly once forward and once backward;
  4. spoofing-rate evaluation against an optional frozen reference
     discriminator (train.py:549-558);
  5. distortion metrics (MCD / BAP-MCD / F0-RMSE / VUV / duration-RMSE)
     computed on device (the reference synced to host per batch,
     train.py:588-595).

Consciously fixed reference quirk (SURVEY.md section 7): the reference's
``loss_d.backward(retain_graph=True)`` leaks discriminator-loss gradients
into the generator's accumulated grads (zero_grad precedes the D update,
train.py:538-539+274), so its generator step optimizes
``loss_g + loss_d``'s generator component — almost surely unintended.  Here
the D update sees ``stop_gradient(y_hat_static)`` and the G update sees only
``loss_g``, i.e. textbook GAN semantics.  The In2Out first-return quirk IS
preserved: ``In2OutHighwayNet`` returns its pre-MLPG trunk output (reference
models.py:63-69, MSE term live), ``In2OutRNNHighwayNet`` returns the input
(models.py:94-118, MSE term inert).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.struct
import optax

from gantts_tpu.core.masking import masked_mse_loss, sequence_mask
from gantts_tpu.core.paramgen import multi_stream_mlpg
from gantts_tpu.core.streams import (
    get_static_features,
    get_static_stream_sizes,
    select_streams,
)
from gantts_tpu.models import include_parameter_generation
from gantts_tpu.train import metrics as M

EPS = 1e-20  # reference train.py:246, 285


def _safe_log(p):
    """log(max(p, EPS)) — the reassociation-proof form of the reference's
    ``log(p + eps)`` (train.py:269-270, 303).

    ``log(1 - D + EPS)`` is NOT safe under jit: XLA may reassociate the
    constants into ``(1 + EPS) - D == 1.0 - D``, which is exactly 0 when a
    warmed-up discriminator saturates to sigmoid(z) == 1.0 in f32 — the
    first adversarial step then emits -inf -> NaN params (observed; eager
    execution of the same graph is finite).  Clamping instead is bit-equal
    to the reference for every f32 value of D (the f32 ulp near 1 is ~6e-8,
    so adding 1e-20 never changes a non-saturated value) and its VJP is 0
    in the clamped region, which also removes the 1/EPS gradient spike.
    """
    return jnp.log(jnp.maximum(p, EPS))


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static (compile-time) configuration distilled from an hparams bundle."""

    name: str                      # "vc" | "duration" | "acoustic"
    stream_sizes: tuple
    has_dynamic_features: tuple
    num_windows: int
    adversarial_streams: Optional[tuple]
    mask_nth_mgc_for_adv_loss: int
    discriminator_linguistic_condition: bool
    order: int = 59
    mse_w: float = 0.0
    mge_w: float = 1.0
    update_d: bool = True
    update_g: bool = True
    use_adv: bool = True           # w_d > 0
    has_ref: bool = False
    add_noise: bool = False
    mlpg_impl: str = "dense"       # "dense" (R matmul) | "stencil" (O(T*W))

    @classmethod
    def from_hparams(cls, hp, w_d, mse_w, mge_w, update_d, update_g,
                     has_ref=False):
        return cls(
            name=hp.name,
            stream_sizes=tuple(hp.stream_sizes),
            has_dynamic_features=tuple(hp.has_dynamic_features),
            num_windows=len(hp.windows),
            adversarial_streams=(tuple(hp.adversarial_streams)
                                 if hp.adversarial_streams is not None else None),
            mask_nth_mgc_for_adv_loss=hp.mask_nth_mgc_for_adv_loss,
            discriminator_linguistic_condition=hp.discriminator_linguistic_condition,
            order=getattr(hp, "order", 59),
            mse_w=mse_w, mge_w=mge_w,
            update_d=update_d and w_d > 0,
            update_g=update_g,
            use_adv=w_d > 0,
            has_ref=has_ref,
            add_noise=hp.generator_add_noise,
            mlpg_impl=getattr(hp, "mlpg_impl", "dense"),
        )

    @property
    def static_stream_sizes(self):
        return tuple(int(s) for s in get_static_stream_sizes(
            self.stream_sizes, self.has_dynamic_features, self.num_windows))

    @property
    def has_dynamic(self):
        return any(self.has_dynamic_features)


def get_selected_static_stream(y_static, cfg: StepConfig):
    """Adversarial stream selection + leading-mgc masking (train.py:232-242)."""
    y_sel = select_streams(y_static, cfg.static_stream_sizes,
                           streams=cfg.adversarial_streams)
    if cfg.mask_nth_mgc_for_adv_loss > 0:
        y_sel = y_sel[..., cfg.mask_nth_mgc_for_adv_loss:]
    return y_sel


def _split_streams_inv_scale(y_static, Y_mean, Y_std, cfg: StepConfig):
    """train.py:358-396: split acoustic statics and denormalize per stream.

    Stats vectors are indexed in the static+dynamic domain (the stats are for
    the full 187-dim feature), statics take the leading block of each stream.
    """
    mgc_dim, lf0_dim, vuv_dim, bap_dim = cfg.stream_sizes
    K = cfg.num_windows
    lf0_start = mgc_dim
    vuv_start = lf0_start + lf0_dim
    bap_start = vuv_start + vuv_dim
    s_mgc, s_lf0, s_vuv, s_bap = cfg.static_stream_sizes

    mgc = y_static[..., :s_mgc]
    lf0 = y_static[..., s_mgc:s_mgc + s_lf0]
    vuv = y_static[..., s_mgc + s_lf0]
    bap = y_static[..., s_mgc + s_lf0 + s_vuv:]

    mgc = mgc * Y_std[:mgc_dim // K] + Y_mean[:mgc_dim // K]
    lf0 = lf0 * Y_std[lf0_start:lf0_start + lf0_dim // K] + \
        Y_mean[lf0_start:lf0_start + lf0_dim // K]
    bap = bap * Y_std[bap_start:bap_start + bap_dim // K] + \
        Y_mean[bap_start:bap_start + bap_dim // K]
    vuv = vuv * Y_std[vuv_start] + Y_mean[vuv_start]
    vuv = (vuv > 0.5).astype(jnp.float32)
    return mgc, lf0, vuv, bap


def compute_distortions(y_static, y_hat_static, Y_mean, Y_std, mask,
                        cfg: StepConfig):
    """Device-side equivalent of train.py:399-432."""
    if cfg.name == "acoustic":
        mgc, lf0, vuv, bap = _split_streams_inv_scale(
            y_static, Y_mean, Y_std, cfg)
        mgc_h, lf0_h, vuv_h, bap_h = _split_streams_inv_scale(
            y_hat_static, Y_mean, Y_std, cfg)
        f0_mse = M.lf0_mean_squared_error(lf0, vuv, lf0_h, vuv_h, mask,
                                          linear_domain=True)
        return {
            "mcd": M.melcd(mgc[..., 1:], mgc_h[..., 1:], mask),
            "bap_mcd": M.melcd(bap, bap_h, mask) / 10.0,
            "f0_rmse": jnp.sqrt(f0_mse),
            "vuv_err": M.vuv_error(vuv, vuv_h, mask),
        }
    elif cfg.name == "duration":
        a = y_static * Y_std + Y_mean
        b = y_hat_static * Y_std + Y_mean
        return {"dur_rmse": jnp.sqrt(M.mean_squared_error(a, b, mask))}
    elif cfg.name == "vc":
        sd = cfg.order
        a = y_static * Y_std[:sd] + Y_mean[:sd]
        b = y_hat_static * Y_std[:sd] + Y_mean[:sd]
        return {"mcd": M.melcd(a, b, mask)}
    else:
        raise AssertionError(cfg.name)


class GanTrainer:
    """Holds models/optimizers/static config; compiles one step per
    (phase, batch-shape) and caches it."""

    def __init__(self, model_g, model_d, tx_g, tx_d, cfg: StepConfig,
                 Y_mean, Y_std, model_ref=None, windows=None):
        self.windows = windows  # needed only for mlpg_impl="stencil"
        self.model_g = model_g
        self.model_d = model_d
        self.model_ref = model_ref if model_ref is not None else model_d
        self.tx_g = tx_g
        self.tx_d = tx_d
        self.cfg = cfg
        self.Y_mean = jnp.asarray(Y_mean, jnp.float32)
        self.Y_std = jnp.asarray(Y_std, jnp.float32)
        self._jitted = {}

    # -- generator forward under both protocols (train.py:336-355) ----------
    def _gen_forward(self, params, gen_in, R, lengths, train, rng):
        rngs = {"dropout": rng} if train else None
        det = not train
        if include_parameter_generation(self.model_g):
            y_hat, y_hat_static = self.model_g.apply(
                params, gen_in, R, lengths, deterministic=det, rngs=rngs)
        else:
            y_hat = self.model_g.apply(
                params, gen_in, lengths, deterministic=det, rngs=rngs)
            y_hat_static = self._mlpg(y_hat, R)
        return y_hat, y_hat_static

    def _mlpg(self, y_hat, R):
        from gantts_tpu.core.fast_mlpg import (
            DEFAULT_HALFWIDTH, multi_stream_mlpg_stencil)

        T = y_hat.shape[1]
        if (self.cfg.mlpg_impl == "stencil" and self.windows is not None
                and T >= 4 * DEFAULT_HALFWIDTH + 2):
            return multi_stream_mlpg_stencil(
                y_hat, self.windows, self.cfg.stream_sizes,
                self.cfg.has_dynamic_features)
        return multi_stream_mlpg(
            y_hat, R, self.cfg.stream_sizes, self.cfg.has_dynamic_features)

    def _apply_d(self, params, feats, lengths, train, rng):
        rngs = {"dropout": rng} if train else None
        return self.model_d.apply(params, feats, lengths,
                                  deterministic=not train, rngs=rngs)

    # -- batch/operand placement (overridden by the data-parallel trainer) ---
    def put_batch(self, x, y, lengths, z=None):
        """Place one host batch on device(s).  Single-device: plain upload."""
        return (jnp.asarray(x), jnp.asarray(y), jnp.asarray(lengths),
                jnp.asarray(z) if z is not None else None)

    def put_stacked_batch(self, xs, ys, lengths_s, zs=None):
        """Place a (K, ...)-stacked group of same-shape batches for
        multi_step_fn.  Any trainer that sets ``supports_multi_step`` must
        keep this consistent with its ``put_batch`` placement (the fused
        driver in train/loop.py uploads through this hook, bypassing the
        per-batch path)."""
        return (jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(lengths_s),
                jnp.asarray(zs) if zs is not None else None)

    def put_replicated(self, a):
        """Place a batch-independent operand (e.g. the MLPG matrix R)."""
        return jnp.asarray(a)

    def place_states(self, *states):
        """Place model/optimizer state pytrees before the first step.
        Single-device: no-op (jit commits them); the data-parallel trainer
        replicates them over the mesh (required under multi-host, where jit
        cannot accept process-local arrays)."""
        return states

    def step_fn(self, train: bool):
        """Return the jitted step for the given phase (compiled per shape)."""
        key = bool(train)
        if key not in self._jitted:
            # Donate state buffers only when they are actually replaced —
            # donating in the eval phase invalidates the caller's arrays
            # while returning them unchanged.
            self._jitted[key] = jax.jit(
                partial(self._step, train),
                donate_argnums=(0, 1) if train else ())
        return self._jitted[key]

    # Whether train_loop may drive this trainer through multi_step_fn.
    # The data-parallel subclass overrides to False: its jits carry
    # explicit in_shardings and the fused driver has no sharded variant
    # (on a mesh the per-dispatch overhead this amortizes is minor).
    supports_multi_step = True

    def multi_step_fn(self, train: bool, form: str | None = None):
        """K training steps per dispatch over K stacked same-shape
        batches.  Bit-identical to K sequential ``step_fn`` calls (same
        order, same chained rng), but costs ONE dispatch — on axon every
        dispatch is a ~2 ms tunnel RPC that donation serializes with
        execution, so fusing K steps removes (K-1)/K of that overhead.
        K is a trace-time property of the stacked leading axis;
        R/ref_params/adv_w are per-dispatch constants (passed as
        arguments, never baked in — axon rejects large closure
        constants).  Returns (gstate, dstate, outs, rng) where ``outs``
        holds (K,)-stacked scalars.

        ``form``: "unrolled" (default; straight-line K-step body, states
        alias in place) or "scan" (K-x-smaller program; also selected by
        GANTTS_TPU_MULTISTEP_SCAN=1).  train/loop.py retries with "scan"
        if the unrolled program is rejected at compile time."""
        import os as _os
        if form is None:
            form = "scan" if _os.environ.get("GANTTS_TPU_MULTISTEP_SCAN") \
                else "unrolled"
        key = (bool(train), "multi", form)
        if key not in self._jitted:
            use_scan = form == "scan"

            def fused_scan(gstate, dstate, ref_params, xs, ys, lengths_s,
                           R, zs, adv_w, rng):
                def body(carry, batch):
                    gstate, dstate, rng = carry
                    if zs is None:
                        x, y, lengths = batch
                        z = None
                    else:
                        x, y, lengths, z = batch
                    gstate, dstate, out, rng = self._step(
                        train, gstate, dstate, ref_params, x, y, lengths,
                        R, z, adv_w, rng)
                    return (gstate, dstate, rng), out
                seq = ((xs, ys, lengths_s) if zs is None
                       else (xs, ys, lengths_s, zs))
                (gstate, dstate, rng), outs = jax.lax.scan(
                    body, (gstate, dstate, rng), seq)
                return gstate, dstate, outs, rng

            def fused_unrolled(gstate, dstate, ref_params, xs, ys,
                               lengths_s, R, zs, adv_w, rng):
                # Straight-line K-step body (K = trace-time leading axis):
                # unlike lax.scan, there is no loop carry, so XLA aliases
                # the G/D/optimizer state buffers through every step
                # in-place instead of double-buffering them per iteration
                # (measured +0.8 ms/step of pure state copy at the bench
                # shape).  Same order, same chained rng -> bit-identical
                # to sequential steps (pinned in tests/test_train.py).
                outs = []
                for k in range(xs.shape[0]):
                    gstate, dstate, out, rng = self._step(
                        train, gstate, dstate, ref_params, xs[k], ys[k],
                        lengths_s[k], R, zs[k] if zs is not None else None,
                        adv_w, rng)
                    outs.append(out)
                outs = jax.tree_util.tree_map(
                    lambda *ls: jnp.stack(ls), *outs)
                return gstate, dstate, outs, rng

            # GANTTS_TPU_MULTISTEP_SCAN=1 restores the lax.scan form (K x
            # smaller program — safety valve for axon's remote-compile
            # program-size limit at very large K or model sizes).
            self._jitted[key] = jax.jit(
                fused_scan if use_scan else fused_unrolled,
                donate_argnums=(0, 1) if train else ())
        return self._jitted[key]

    def _step(self, train, gstate, dstate, ref_params, x, y, lengths, R, z,
              adv_w, rng):
        cfg = self.cfg
        T = x.shape[1]
        mask = sequence_mask(lengths, T)[..., None]
        Tm = jnp.sum(mask)

        y_static = get_static_features(
            y, cfg.num_windows, cfg.stream_sizes, cfg.has_dynamic_features)

        gen_in = jnp.concatenate([x, z], axis=-1) if cfg.add_noise else x
        # 4-way split kept for rng-stream stability; slot 2 (once the
        # separate D-fake application) is unused since real+fake became one
        # batched D call under rng_dr.
        rng_g, rng_dr, _, rng_dg = jax.random.split(rng, 4)
        # Successor key for the NEXT step, advanced in-program so callers
        # never dispatch a separate split per batch (on axon every dispatch
        # is a ~2 ms tunnel RPC; bench.py/train/loop.py chain this instead).
        # fold_in (not a 5th split slot) keeps the in-step stream above
        # byte-identical for a given input key.
        rng_next = jax.random.fold_in(rng, 0x600D)

        # 1. generator forward, vjp captured for reuse
        (y_hat, y_hat_static), g_vjp = jax.vjp(
            lambda p: self._gen_forward(p, gen_in, R, lengths, train, rng_g),
            gstate.params)

        out = {"num_frames": jnp.sum(lengths)}

        # 2. spoofing rate vs frozen reference D (always deterministic)
        if cfg.has_ref:
            y_ref = (get_selected_static_stream(y_hat_static, cfg)
                     if cfg.adversarial_streams is not None else y_hat_static)
            target = self.model_ref.apply(ref_params, y_ref, lengths,
                                          deterministic=True)
            out["regard_fake_as_natural"] = jnp.sum(
                (target > 0.5).astype(jnp.float32) * mask)

        # 3. discriminator update (train.py:245-279)
        if cfg.update_d:
            if cfg.adversarial_streams is not None:
                y_adv = get_selected_static_stream(y_static, cfg)
                y_hat_adv = get_selected_static_stream(
                    jax.lax.stop_gradient(y_hat_static), cfg)
            else:
                y_adv = y_static
                y_hat_adv = jax.lax.stop_gradient(y_hat_static)
            if cfg.discriminator_linguistic_condition:
                y_adv = jnp.concatenate([x, y_adv], axis=-1)
                y_hat_adv = jnp.concatenate([x, y_hat_adv], axis=-1)

            def d_loss_fn(params_d):
                # real and fake batched into ONE discriminator application
                # (the per-frame MLP is batch-position-independent)
                both = jnp.concatenate([y_adv, y_hat_adv], axis=0)
                lengths2 = jnp.concatenate([lengths, lengths])
                D_both = self._apply_d(params_d, both, lengths2, train,
                                       rng_dr)
                B0 = y_adv.shape[0]
                D_real, D_fake = D_both[:B0], D_both[B0:]
                loss_real = -jnp.sum(_safe_log(D_real) * mask) / Tm
                loss_fake = -jnp.sum(_safe_log(1 - D_fake) * mask) / Tm
                real_cc = jnp.sum((D_real > 0.5).astype(jnp.float32) * mask)
                fake_cc = jnp.sum((D_fake < 0.5).astype(jnp.float32) * mask)
                return loss_real + loss_fake, (loss_real, loss_fake,
                                               real_cc, fake_cc)

            (loss_d, (loss_real_d, loss_fake_d, real_cc, fake_cc)), grads_d = \
                jax.value_and_grad(d_loss_fn, has_aux=True)(dstate.params)
            if train:
                updates, new_opt = self.tx_d.update(
                    grads_d, dstate.opt_state, dstate.params)
                dstate = TrainState(
                    params=optax.apply_updates(dstate.params, updates),
                    opt_state=new_opt)
            out.update(discriminator=loss_d, loss_real_d=loss_real_d,
                       loss_fake_d=loss_fake_d,
                       real_correct_count=real_cc,
                       fake_correct_count=fake_cc)

        # 4. generator update (train.py:282-320); adversarial term through the
        #    just-updated discriminator, as in the reference's sequencing.
        if cfg.update_g:
            def out_loss(y_hat_v, y_hat_static_v):
                loss_mge = masked_mse_loss(y_hat_static_v, y_static, mask=mask)
                loss_mse = masked_mse_loss(y_hat_v, y, mask=mask)
                if cfg.use_adv:
                    yh = (get_selected_static_stream(y_hat_static_v, cfg)
                          if cfg.adversarial_streams is not None
                          else y_hat_static_v)
                    if cfg.discriminator_linguistic_condition:
                        yh = jnp.concatenate([x, yh], axis=-1)
                    D_fake_g = self._apply_d(dstate.params, yh, lengths,
                                             train, rng_dg)
                    loss_adv = -jnp.sum(_safe_log(D_fake_g) * mask) / Tm
                else:
                    loss_adv = jnp.float32(0.0)
                loss_g = (cfg.mse_w * loss_mse + cfg.mge_w * loss_mge
                          + adv_w * loss_adv)
                return loss_g, (loss_mse, loss_mge, loss_adv)

            (loss_g, (loss_mse, loss_mge, loss_adv)), grads_out = \
                jax.value_and_grad(out_loss, argnums=(0, 1), has_aux=True)(
                    y_hat, y_hat_static)
            if train:
                grads_g = g_vjp(grads_out)[0]
                updates, new_opt = self.tx_g.update(
                    grads_g, gstate.opt_state, gstate.params)
                gstate = TrainState(
                    params=optax.apply_updates(gstate.params, updates),
                    opt_state=new_opt)
            out.update(mse=loss_mse, mge=loss_mge, loss_adv=loss_adv,
                       generator=loss_g)

        # 5. distortion metrics — unconditionally. Conscious change: the
        #    reference computes them only under update_g (train.py:585-595),
        #    so its D-warmup stage logs no quality series. Computing them
        #    every batch costs nothing extra here (the y_hat forward already
        #    ran) and keeps MCD/F0 curves continuous across curriculum
        #    stages. Documented in PARITY.md "Consciously changed".
        out.update(compute_distortions(
            y_static, jax.lax.stop_gradient(y_hat_static),
            self.Y_mean, self.Y_std, mask, cfg))

        return gstate, dstate, out, rng_next
