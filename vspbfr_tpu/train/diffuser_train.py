"""Stage-2 trainer: code diffuser training (the `code_diffuser_train.py` CLI).

One jitted step per iteration (`code_diffuser_train.py:152-192`):

  low_latent = E(low); target = E(real) (both frozen encodes)
  pred_latent, chain = 4-step unrolled reverse diffusion WITH grads, noising
    the LOW latent to t=T-1 and conditioning on it (`ldm/ddpm.py:408-420`)
  loss = L1(pred, target)                       <- the only latent term (Q3:
        the KD-KL is computed for logging but NOT optimized)
       + 0.1 * LPIPS(decode(pred), real).mean() <- grads THROUGH the frozen
       + 0.1 * ArcFace-ID(decode(pred), real)      StyleGAN2 decoder
  Adam(lr*0.8, betas (0, 0.99^0.8)) on diffuser params only.

The reference's open/close_stylegan_grad dance (`code_diffuser_train.py:167,
191`) is simply "decode without stop_gradient" here — decoder params are not
in the optimizer, so they never update, but gradients flow through them into
the latent.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from vspbfr_tpu.losses import kd_loss
from vspbfr_tpu.losses.id_loss import ResNet101Embedder, id_loss
from vspbfr_tpu.losses.lpips import LPIPS
from vspbfr_tpu.pipeline import RestorationPipeline
from vspbfr_tpu.train.state import TrainState, make_adam


@dataclasses.dataclass(frozen=True)
class DiffuserTrainConfig:
    """Defaults = `code_diffuser_train.py:249-273` (+ hardcoded 0.1 weights)."""

    size: int = 256             # eval/decode size
    batch: int = 16             # per-device
    lr: float = 0.002
    reg_every: int = 4          # optimizer ratio only
    percept_weight: float = 0.1
    id_weight: float = 0.1
    kd_temperature: float = 0.15
    timesteps: int = 4
    # rematerialize the decode forward inside the grad. None = auto: ON
    # in f32 (the 1024px decoder's activations need ~2x the 16GB HBM at
    # b8 otherwise), OFF in bf16 — measured r5: b8 197.8 -> 154.3 ms,
    # and the reference-equivalent b16 fits plain at 294.9 ms
    # (54.3 imgs/s). Pure scheduling change; the f32 latent chain stays
    # bitwise identical (tests/test_train.py asserts the L1 term equal).
    remat: bool | None = None
    # gradient accumulation: split each step's batch into `grad_accum`
    # sequential microbatches and average their grads before the one Adam
    # update. The reference's per-GPU batch 16 (`code_diffuser_train.py:
    # 251-253`) needs ~37GB of decoder activations — beyond a 16GB v5e
    # chip — so the reference-equivalent per-chip batch runs as b8 x 2.
    # Every stage-2 loss term is a mean, so mean-of-microbatch-grads is
    # exactly the full-batch gradient (no sum-reduced term to rescale).
    grad_accum: int = 1
    # mixed precision: "bfloat16" runs the image-space decode (the frozen
    # 1024px StyleGAN2 forward AND its backward — the step's dominant
    # cost) in bf16. The precision-sensitive latent chain — e4e encodes,
    # the 4-step DDPM, the L1 target — stays f32 bitwise-identical to the
    # f32 step. None (default) = full f32.
    compute_dtype: str | None = None
    # bf16 LPIPS/ArcFace conv trunks with f32 heads/reductions (round-5
    # island, active only with compute_dtype; see losses/lpips.py)
    bf16_loss_nets: bool = True


class DiffuserTrainer:
    def __init__(self, config: DiffuserTrainConfig,
                 pipeline: RestorationPipeline | None = None):
        self.cfg = config
        self.pipe = pipeline or RestorationPipeline(
            size=config.size, timesteps=config.timesteps)
        ln_dt = (jnp.dtype(config.compute_dtype)
                 if config.compute_dtype and config.bf16_loss_nets else None)
        self.lpips = LPIPS(compute_dtype=ln_dt)
        self.id_net = ResNet101Embedder(compute_dtype=ln_dt)
        self.tx = make_adam(config.lr, config.reg_every)

    def init_states(self, key: jax.Array):
        k_pipe, k_lpips, k_id = jax.random.split(key, 3)
        params = self.pipe.init_params(k_pipe)
        lpips_params = (self.lpips.init(
            k_lpips, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))
            ["params"] if self.cfg.percept_weight > 0 else {})
        id_params = (self.id_net.init(
            k_id, jnp.zeros((1, 112, 112, 3)))["params"]
            if self.cfg.id_weight > 0 else {})
        state = TrainState.create(params["diffuser"], self.tx)
        frozen = {"psp": params["psp"], "lpips": lpips_params, "id": id_params}
        return state, frozen

    def train_step(self, state: TrainState, frozen: Any, low: jnp.ndarray,
                   real: jnp.ndarray, rng: jax.Array):
        cfg = self.cfg
        if cfg.grad_accum > 1:
            return self._train_step_accum(state, frozen, low, real, rng)
        loss, metrics, grads = self._loss_and_grads(state.params, frozen,
                                                    low, real, rng)
        state = state.apply_gradients(grads)
        metrics["loss"] = loss
        return state, metrics

    def _train_step_accum(self, state: TrainState, frozen: Any,
                          low: jnp.ndarray, real: jnp.ndarray,
                          rng: jax.Array):
        """One optimizer update from `grad_accum` sequential microbatches.

        The batch axis splits evenly; grads/metrics are averaged (all loss
        terms are means over the batch, so this equals the full-batch step
        up to fp reduction order). lax.scan keeps ONE microbatch of
        activations live at a time — the reference-equivalent global batch
        at a fraction of the activation memory."""
        a = self.cfg.grad_accum
        b = low.shape[0]
        assert b % a == 0, f"batch {b} not divisible by grad_accum {a}"
        mb = b // a
        lows = low.reshape(a, mb, *low.shape[1:])
        reals = real.reshape(a, mb, *real.shape[1:])
        keys = jax.random.split(rng, a)

        def body(carry, xs):
            low_i, real_i, k_i = xs
            loss, metrics, grads = self._loss_and_grads(
                state.params, frozen, low_i, real_i, k_i)
            acc_loss, acc_m, acc_g = carry
            acc_g = jax.tree.map(lambda u, v: u + v / a, acc_g, grads)
            acc_m = jax.tree.map(lambda u, v: u + v / a, acc_m, metrics)
            return (acc_loss + loss / a, acc_m, acc_g), None

        zero_g = jax.tree.map(jnp.zeros_like, state.params)
        zero_m = {k: jnp.zeros(()) for k in ("l1", "kl", "percept", "id")}
        (loss, metrics, grads), _ = jax.lax.scan(
            body, (jnp.zeros(()), zero_m, zero_g), (lows, reals, keys))
        state = state.apply_gradients(grads)
        metrics["loss"] = loss
        return state, metrics

    def _loss_and_grads(self, params, frozen: Any, low: jnp.ndarray,
                        real: jnp.ndarray, rng: jax.Array):
        cfg = self.cfg
        k_noise, k_dec = jax.random.split(rng)
        psp = self.pipe.psp
        low_latent = psp.get_w_plus(frozen["psp"], low)
        target = psp.get_w_plus(frozen["psp"], real)  # already stop_gradient

        init_noise = jax.random.normal(k_noise, low_latent.shape)

        def loss_fn(diff_params):
            ddpm = self.pipe.ddpm(diff_params)
            pred_latent, chain = ddpm.training_chain(
                low_latent, low_latent, init_noise)
            kl, l_abs = kd_loss(chain[-1], target, cfg.kd_temperature)
            loss = l_abs
            percept = ident = jnp.zeros(())
            # weight>0 gates match `code_diffuser_train.py:177,:182`
            if cfg.percept_weight > 0 or cfg.id_weight > 0:
                dt = (jnp.dtype(cfg.compute_dtype)
                      if cfg.compute_dtype else None)

                def decode(p, lat):
                    if dt is not None:
                        # bf16 island: decoder params + latent cast inside
                        # the traced fn — grads return f32 through the
                        # casts; output back to f32 for the loss nets
                        p = {**p, "decoder": jax.tree.map(
                            lambda x: x.astype(dt)
                            if jnp.issubdtype(x.dtype, jnp.floating) else x,
                            p["decoder"])}
                        lat = lat.astype(dt)
                    out = psp.decode(p, lat, noise_rng=k_dec)
                    return out.astype(jnp.float32)

                do_remat = (cfg.remat if cfg.remat is not None
                            else cfg.compute_dtype is None)
                if do_remat:
                    decode = jax.checkpoint(decode)
                restored = decode(frozen["psp"], pred_latent)  # grads flow through decoder
            if cfg.percept_weight > 0:
                percept = jnp.mean(self.lpips.apply(
                    {"params": frozen["lpips"]}, restored,
                    real)) * cfg.percept_weight
            if cfg.id_weight > 0:
                ident = id_loss(self.id_net.apply, frozen["id"], restored,
                                real) * cfg.id_weight
            loss = loss + percept + ident
            return loss, {"l1": l_abs, "kl": kl, "percept": percept,
                          "id": ident}

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        return loss, metrics, grads

    def jit_step(self, mesh=None):
        step = functools.partial(self.train_step)
        if mesh is None:
            return jax.jit(step, donate_argnums=(0,))
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(
            step,
            in_shardings=(repl, repl, data, data, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )
