"""Stage-3 trainer: GAN restoration training (the `restoration_train.py` CLI).

One jitted, mesh-sharded train step per iteration containing the whole
reference loop body (`restoration_train.py:153-276`):

  frozen: encode low -> W+ -> 4-step DDPM -> StyleGAN2 feats   (no grads)
  D step: softplus GAN loss on (real, restored), Adam update
  R1:     every `d_reg_every` steps, a second D update with
          r1/2 * ||dD/dx||^2 * d_reg_every (lazy regularization)
  G step: non-saturating + LPIPS.sum()*percept_w + ArcFace-ID*id_w,
          fresh mixing noise, same frozen embedding (`:221-249`)
  EMA:    g_ema <- 0.99779 * g_ema + ... (`:255`)

Data-parallel: params replicated, batch sharded over the mesh "data" axis;
XLA inserts the gradient all-reduces (replaces DDP/NCCL, SURVEY.md §2.6).
Loss scalars leave the step already globally averaged (replaces
reduce_loss_dict).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from vspbfr_tpu.losses import d_logistic_loss, g_nonsaturating_loss, r1_penalty
from vspbfr_tpu.losses.ada import ADAState, ada_update, augment
from vspbfr_tpu.losses.id_loss import ResNet101Embedder, id_loss
from vspbfr_tpu.losses.lpips import LPIPS
from vspbfr_tpu.pipeline import RestorationPipeline
from vspbfr_tpu.train.state import (
    EMA_DECAY_DEFAULT,
    TrainState,
    ema_update,
    make_adam,
)


@dataclasses.dataclass(frozen=True)
class RestoreTrainConfig:
    """Defaults = `restoration_train.py:310-342` + hardcoded post-parse."""

    size: int = 512
    batch: int = 4              # per-device
    lr: float = 0.002
    r1: float = 10.0
    d_reg_every: int = 16
    g_reg_every: int = 4        # only affects optimizer hyperparams (vestigial path reg)
    percept_weight: float = 0.5
    id_weight: float = 0.1
    mixing: float = 0.5
    ema_decay: float = EMA_DECAY_DEFAULT
    augment: bool = False       # ADA, off by default (`:330-333`)
    # fixed augmentation probability; 0 = adaptive (the reference's
    # --augment_p semantics, `restoration_train.py:138-141`: > 0 disables
    # the controller and augments at this constant p)
    augment_p: float = 0.0
    ada_target: float = 0.6
    ada_length: int = 500 * 1000
    # rematerialize G/D forwards inside the grads. None = auto: ON in f32
    # (the 512px step otherwise exceeds a v5e's 16GB HBM — R1 double-grad
    # + full activation residency), OFF in bf16 (halved activations fit,
    # and recompute costs a measured 83 ms/step: d 195->164, g 288->236,
    # scripts/exp_stage3_phases.py r5). Remat changes scheduling only —
    # same math — so no quality gate is needed beyond the overlay.
    remat: bool | None = None
    # mixed precision: "bfloat16" runs the G and D FORWARD/BACKWARD compute
    # in bf16 with f32 islands — params, optimizer states, EMA, loss
    # reductions, D logits, and the R1 penalty accumulation stay f32.
    # None (default) = full f32, the reference's training dtype.
    compute_dtype: str | None = None
    # round-5 islands (active only with compute_dtype set; each overlay-
    # gated by scripts/exp_bf16_train.py before its default was chosen):
    # bf16_embed: the frozen StyleGAN2 decode inside the per-step
    #   embedding runs bf16 (no grads flow through it — stop_gradient —
    #   and it is the proven INFERENCE recipe for the same subgraph);
    #   the e4e encode + DDPM latent chain stay f32 as everywhere else.
    # bf16_loss_nets: LPIPS-VGG16 / ArcFace conv trunks run bf16 with
    #   f32 normalize/lin-heads/reductions (losses/lpips.py, id_loss.py).
    bf16_embed: bool = True
    bf16_loss_nets: bool = True


class RestoreTrainer:
    """Bundles the pipeline, D, losses and the jitted step."""

    def __init__(self, config: RestoreTrainConfig,
                 pipeline: RestorationPipeline | None = None):
        self.cfg = config
        self.pipe = pipeline or RestorationPipeline(
            size=config.size, mixing_prob=config.mixing)
        self.disc = self.pipe.make_discriminator()
        ln_dt = (jnp.dtype(config.compute_dtype)
                 if config.compute_dtype and config.bf16_loss_nets else None)
        self.lpips = LPIPS(compute_dtype=ln_dt)
        self.id_net = ResNet101Embedder(compute_dtype=ln_dt)
        self.g_tx = make_adam(config.lr, config.g_reg_every)
        self.d_tx = make_adam(config.lr, config.d_reg_every)

    # -- init ---------------------------------------------------------------

    def init_states(self, key: jax.Array):
        k_pipe, k_d, k_lpips, k_id = jax.random.split(key, 4)
        params = self.pipe.init_params(k_pipe)
        d_params = self.disc.init(
            k_d, jnp.zeros((1, self.cfg.size, self.cfg.size, 3)))["params"]
        lpips_params = (self.lpips.init(
            k_lpips, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))
            ["params"] if self.cfg.percept_weight > 0 else {})
        id_params = (self.id_net.init(
            k_id, jnp.zeros((1, 112, 112, 3)))["params"]
            if self.cfg.id_weight > 0 else {})
        g_state = TrainState.create(params["generator"], self.g_tx)
        d_state = TrainState.create(d_params, self.d_tx)
        frozen = {"psp": params["psp"], "diffuser": params["diffuser"],
                  "lpips": lpips_params, "id": id_params}
        return g_state, d_state, params["generator"], frozen  # g_ema = copy

    # -- step ---------------------------------------------------------------

    def _frozen_embedding(self, frozen, low, rng):
        """Shared per-iteration embedding (`restoration_train.py:166-172`).

        With compute_dtype + bf16_embed the frozen 1024px decode runs bf16
        (the inference recipe for the same subgraph; encode + DDPM stay
        f32 — the W+ latent is the most error-amplified tensor). feats
        come back bf16; every consumer (_generate) casts anyway."""
        k_diff, k_dec = jax.random.split(rng)
        pipe_params = {"psp": frozen["psp"], "diffuser": frozen["diffuser"]}
        low_latent = self.pipe.psp.get_w_plus(frozen["psp"], low)
        clean = self.pipe.diffuse_latent(pipe_params, low_latent, k_diff)
        psp_p, lat = frozen["psp"], clean
        if self._dt is not None and self.cfg.bf16_embed:
            psp_p = {**psp_p, "decoder": self._cast(psp_p["decoder"])}
            lat = clean.astype(self._dt)
        _, feats = self.pipe.psp.decode_with_feats(psp_p, lat,
                                                   noise_rng=k_dec)
        return (jax.lax.stop_gradient(clean),
                jax.lax.stop_gradient(feats))

    @property
    def _remat(self):
        if self.cfg.remat is not None:
            return self.cfg.remat
        return self.cfg.compute_dtype is None  # auto: f32 on, bf16 off

    @property
    def _dt(self):
        return (jnp.dtype(self.cfg.compute_dtype)
                if self.cfg.compute_dtype else None)

    def _cast(self, tree):
        dt = self._dt
        if dt is None:
            return tree
        return jax.tree.map(
            lambda x: x.astype(dt)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x, tree)

    def _generate(self, g_params, low, feats, clean, rng,
                  deterministic=False):
        k_mix, k_noise, k_drop = jax.random.split(rng, 3)
        noise_latent = self.pipe.sample_mixing_latent(g_params, k_mix,
                                                      low.shape[0])

        def fwd(g_params, low, feats, clean, noise_latent):
            # mixed precision: cast params + activations INSIDE the traced
            # fn, so param/opt state stays f32 and grads come back f32
            # through the casts (loss-scale-free: bf16's f32-range exponent
            # needs no scaling, unlike fp16)
            g_params, low, feats, clean, noise_latent = self._cast(
                (g_params, low, feats, clean, noise_latent))
            out = self.pipe.generator.apply(
                {"params": g_params}, low, feats, clean, noise_latent,
                input_is_latent=True, deterministic=deterministic,
                rngs={"noise": k_noise, "dropout": k_drop})
            return out.astype(jnp.float32)

        if self._remat:
            fwd = jax.checkpoint(fwd)
        return fwd(g_params, low, feats, clean, noise_latent)

    def _disc_apply(self, d_params, x):
        def fwd(d_params, x):
            # logits return in f32 (softplus GAN losses + ADA controller
            # stay full precision)
            d_params, x = self._cast((d_params, x))
            return self.disc.apply({"params": d_params}, x).astype(
                jnp.float32)
        if self._remat:
            fwd = jax.checkpoint(fwd)
        return fwd(d_params, x)

    def d_phase(self, d_state: TrainState, g_params: Any, g_step: jnp.ndarray,
                frozen: Any, low: jnp.ndarray, real: jnp.ndarray,
                rng: jax.Array, ada_state: ADAState | None = None):
        """Embedding + D update + ADA tune + lazy R1. Returns the shared
        frozen embedding for the G phase (reference reuses de_feats /
        infer_embedding across both halves, `restoration_train.py:166-232`).
        Jitted separately from the G phase: the union graph exceeds the
        TPU compile helper's memory at 512px."""
        cfg = self.cfg
        (k_embed, k_gen_d, k_aug_r, k_aug_f, k_aug_r1) = jax.random.split(
            rng, 5)
        clean, feats = self._frozen_embedding(frozen, low, k_embed)

        # ---- D step (`restoration_train.py:164-194`)
        fake_d = jax.lax.stop_gradient(
            self._generate(g_params, low, feats, clean, k_gen_d))

        # optional ADA (`restoration_train.py:175-181`); augment_p > 0 =
        # constant probability, controller off (`:138-141`)
        real_d = real
        if cfg.augment and ada_state is not None:
            p_eff = (jnp.float32(cfg.augment_p) if cfg.augment_p > 0
                     else ada_state.p)
            real_d = augment(k_aug_r, real, p_eff)
            fake_d = augment(k_aug_f, fake_d, p_eff)

        def d_loss_fn(d_params):
            real_pred = self._disc_apply(d_params, real_d)
            fake_pred = self._disc_apply(d_params, fake_d)
            loss = d_logistic_loss(real_pred, fake_pred)
            return loss, (real_pred, jnp.mean(fake_pred))

        (d_loss, (real_pred, fake_score)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(d_state.params)
        real_score = jnp.mean(real_pred)
        d_state = d_state.apply_gradients(d_grads)

        # ---- ADA p controller, fed by the pre-update real_pred
        # (`restoration_train.py:196-198`); bypassed at fixed augment_p
        if cfg.augment and ada_state is not None and cfg.augment_p == 0:
            ada_state = ada_update(ada_state, real_pred,
                                   target=cfg.ada_target,
                                   ada_length=cfg.ada_length)

        # ---- lazy R1 (`restoration_train.py:200-216`), second D update;
        # gradient flows through the augment chain into the raw image.
        # The reference draws a FRESH augmentation for the R1 batch
        # (`restoration_train.py:203-207`), hence k_aug_r1, not k_aug_r.
        def r1_update(d_state):
            def r1_loss_fn(d_params):
                def d_fn(x):
                    if cfg.augment and ada_state is not None:
                        x = augment(k_aug_r1, x, p_eff)
                    return self._disc_apply(d_params, x)
                pen = r1_penalty(d_fn, real)
                return cfg.r1 / 2.0 * pen * cfg.d_reg_every, pen

            (_, pen), grads = jax.value_and_grad(r1_loss_fn, has_aux=True)(
                d_state.params)
            return d_state.apply_gradients(grads), pen

        do_r1 = (g_step % cfg.d_reg_every) == 0
        d_state, r1_val = jax.lax.cond(
            do_r1, r1_update,
            lambda s: (s, jnp.zeros(())), d_state)

        d_metrics = {
            "d": d_loss, "r1": r1_val, "real_score": real_score,
            "fake_score": fake_score,
        }
        if cfg.augment and ada_state is not None:
            # per-batch sign mean — the controller's rt signal
            # (`non_leaking.py:499-504`), logged for trajectory audits
            d_metrics["ada_rt"] = jnp.mean(jnp.sign(real_pred))
        return d_state, clean, feats, d_metrics, ada_state

    def g_phase(self, g_state: TrainState, g_ema: Any, d_params: Any,
                frozen: Any, low: jnp.ndarray, real: jnp.ndarray,
                clean: jnp.ndarray, feats: Any, rng: jax.Array,
                ada_p: jnp.ndarray | None = None):
        """G update (`restoration_train.py:221-249`) + EMA, against the
        already-updated D and the D phase's frozen embedding.

        The one sum-reduced loss term needs care under data parallelism:
        the reference sums LPIPS over the per-GPU batch of `--batch`
        (`restoration_train.py:236-238`) and DDP then *averages* gradients
        across ranks, so its effective global term is
        mean(lpips) * per_gpu_batch — independent of world size. Inside a
        sharded jit we see the global batch, so a bare jnp.sum would grow
        the term by n_devices. We therefore compute
        mean * cfg.batch (the configured per-device batch), which equals
        global_sum / n_ranks whenever each device carries cfg.batch
        samples and is invariant to how a fixed global batch is sharded.
        All other terms are means, which DDP averaging leaves invariant."""
        cfg = self.cfg
        k_gen_g, k_aug_g = jax.random.split(rng)

        # the loss-net terms are gated by weight > 0 exactly like the
        # reference flags (`restoration_train.py:236-245`) — weight 0
        # removes the whole subgraph from the compiled program
        def g_loss_fn(g_params):
            fake = self._generate(g_params, low, feats, clean, k_gen_g)
            fake_for_d = fake
            if cfg.augment and ada_p is not None:
                fake_for_d = augment(k_aug_g, fake, ada_p)
            fake_pred = self._disc_apply(d_params, fake_for_d)
            gan = g_nonsaturating_loss(fake_pred)
            percept = ident = jnp.zeros(())
            if cfg.percept_weight > 0:
                percept = jnp.mean(self.lpips.apply(
                    {"params": frozen["lpips"]}, fake, real)
                    ) * cfg.batch * cfg.percept_weight
            if cfg.id_weight > 0:
                ident = id_loss(self.id_net.apply, frozen["id"], fake,
                                real) * cfg.id_weight
            return gan + percept + ident, (gan, percept, ident)

        (g_loss, (gan_l, percept_l, id_l)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_state.params)
        g_state = g_state.apply_gradients(g_grads)

        g_ema = ema_update(g_ema, g_state.params, cfg.ema_decay)

        g_metrics = {"g": g_loss, "gan": gan_l, "percept": percept_l,
                     "id": id_l}
        return g_state, g_ema, g_metrics

    # -- jit/sharding -------------------------------------------------------

    def jit_step(self, mesh=None):
        """Build the per-iteration step: TWO jitted programs (D phase incl.
        embedding/ADA/R1; G phase incl. EMA) composed by a thin host
        wrapper with the same signature/returns as the old monolith. The
        split exists because the union graph exceeds the TPU compile
        helper's memory at 512px; the frozen embedding tensors flow
        between the two programs on-device.

        With a mesh, (low, real) and the inter-phase embedding are sharded
        on the data axis and states replicated (XLA all-reduces grads)."""
        aug = self.cfg.augment
        kw_d: dict = {}
        kw_g: dict = {}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            kw_d = dict(
                in_shardings=(repl, repl, repl, repl, data, data, repl) +
                             ((repl,) if aug else ()),
                out_shardings=(repl, data, data, repl, repl),
            )
            kw_g = dict(
                in_shardings=(repl, repl, repl, repl, data, data, data,
                              data, repl) + ((repl,) if aug else ()),
                out_shardings=(repl, repl, repl),
            )

        def d_phase(d_state, g_params, g_step, frozen, low, real, rng,
                    ada_state=None):
            return self.d_phase(d_state, g_params, g_step, frozen, low,
                                real, rng, ada_state)

        def g_phase(g_state, g_ema, d_params, frozen, low, real, clean,
                    feats, rng, ada_p=None):
            return self.g_phase(g_state, g_ema, d_params, frozen, low,
                                real, clean, feats, rng, ada_p)

        jit_d = jax.jit(d_phase, donate_argnums=(0,) + ((7,) if aug else ()),
                        **kw_d)
        jit_g = jax.jit(g_phase, donate_argnums=(0, 1), **kw_g)

        def step(g_state, d_state, g_ema, frozen, low, real, rng,
                 ada_state=None):
            k_d, k_g = jax.random.split(rng)
            d_state, clean, feats, d_metrics, ada_state = jit_d(
                d_state, g_state.params, g_state.step, frozen, low, real,
                k_d, *((ada_state,) if aug else ()))
            g_state, g_ema, g_metrics = jit_g(
                g_state, g_ema, d_state.params, frozen, low, real, clean,
                feats, k_g,
                *(((jnp.float32(self.cfg.augment_p)
                    if self.cfg.augment_p > 0 else ada_state.p),)
                  if aug and ada_state is not None else ()))
            metrics = {**d_metrics, **g_metrics}
            if aug and ada_state is not None:
                metrics["ada_p"] = (jnp.float32(self.cfg.augment_p)
                                    if self.cfg.augment_p > 0
                                    else ada_state.p)
                return g_state, d_state, g_ema, metrics, ada_state
            return g_state, d_state, g_ema, metrics

        return step
