"""The full restoration pipeline: encode -> diffuse -> decode -> restore.

This is the product path of the reference (`restoration_test.py:87-157`,
SURVEY.md §3A), composed as one jittable function:

  1. low image -> e4e W+ code           (frozen encoder, 256px)
  2. 4-step deterministic latent DDPM   (visual style prompt)
  3. frozen StyleGAN2 decode w/ feature taps (1024px -> pooled out_size)
  4. RestoreNet(low image, feats, latent, z) -> restored image

Style mixing (`mixing_noise`, `restoration_test.py:68-82`) is expressed
jit-compatibly: two z vectors are always drawn and an inject_index selects
between "no mixing" (index = n_latent) and a uniform split — identical in
distribution to the reference's host-side coin flip.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from vspbfr_tpu.diffusion import DDPMSchedule, LatentDDPM
from vspbfr_tpu.models.code_diffuser import CodeDiffuser
from vspbfr_tpu.models.psp import PSPFacade
from vspbfr_tpu.models.restorenet import Discriminator, RestorationNet


@dataclasses.dataclass
class RestorationPipeline:
    """Module bundle + composition logic. Params are passed explicitly:
    {"psp": {...}, "diffuser": {...}, "generator": {...}}."""

    size: int = 512
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    decoder_size: int = 1024
    timesteps: int = 4
    mixing_prob: float = 0.5
    compute_dtype: Any = None  # e.g. jnp.bfloat16 for MXU-rate inference
    # space-to-depth layout threshold shared by the frozen decoder and
    # RestoreNet (must match — decoder feature taps at packed resolutions
    # flow into RestoreNet's skip fusion packed). 0 disables.
    packed_min_res: int = 512
    # e4e encoder input resolution + IR-SE body config; defaults are the
    # reference's 256px IR-SE-50. Shrink ONLY for compile-budgeted dry-runs.
    encode_size: int = 256
    encoder_stages: Any = None
    # conv-tower width divisor (stylegan2.channel_dict); 1 = reference map.
    # Shrink ONLY for compile-budgeted dry-runs.
    channel_div: int = 1

    def __post_init__(self):
        self.psp = PSPFacade.create(out_size=self.size, size=self.decoder_size,
                                    packed_min_res=self.packed_min_res,
                                    encode_size=self.encode_size,
                                    encoder_stages=self.encoder_stages,
                                    channel_div=self.channel_div)
        self.diffuser = CodeDiffuser(timesteps=self.timesteps)
        self.generator = RestorationNet(
            size=self.size, style_dim=self.style_dim, n_mlp=self.n_mlp,
            channel_multiplier=self.channel_multiplier,
            channel_div=self.channel_div,
            packed_min_res=self.packed_min_res)
        self.schedule = DDPMSchedule.linear(
            timesteps=self.timesteps, linear_start=0.1, linear_end=0.99)

    # -- param init ---------------------------------------------------------

    def init_params(self, key: jax.Array) -> dict[str, Any]:
        k_psp, k_diff, k_gen, k_noise = jax.random.split(key, 4)
        psp_params = self.psp.init_params(k_psp)
        lat = jnp.zeros((1, 18, 512))
        diff_params = self.diffuser.init(
            k_diff, lat, lat, jnp.zeros((1,), jnp.int32))["params"]
        imgs = jnp.zeros((1, self.size, self.size, 3))
        feats = self._dummy_feats(1)
        gen_params = self.generator.init(
            {"params": k_gen, "noise": k_noise},
            imgs, feats, lat, jnp.zeros((1, 1, 512)))["params"]
        return {"psp": psp_params, "diffuser": diff_params,
                "generator": gen_params}

    def _dummy_feats(self, b: int):
        from vspbfr_tpu.models.stylegan2 import channel_dict
        ch = channel_dict(self.channel_multiplier, self.channel_div)
        import math
        n = int(math.log2(self.decoder_size)) - 1
        pmr = self.packed_min_res or (2 * self.decoder_size)
        out = []
        for f in range(n):
            r, c = 2 ** (f + 2), ch[2 ** (f + 2)]
            if r >= pmr:
                out.append(jnp.zeros((b, r // 2, r // 2, 4 * c)))
            else:
                out.append(jnp.zeros((b, r, r, c)))
        return out

    # -- composition stages -------------------------------------------------

    def ddpm(self, diffuser_params) -> LatentDDPM:
        def denoise(x, c, t):
            return self.diffuser.apply({"params": diffuser_params}, x, c, t)
        return LatentDDPM(denoise, self.schedule)

    def diffuse_latent(self, params, low_latent: jnp.ndarray,
                       rng: jax.Array, training: bool = False):
        """Eval: clean latent from pure noise; training: full chain w/ grads."""
        ddpm = self.ddpm(params["diffuser"])
        # f32 draw + cast: bf16 compute_dtype sees the f32 random stream
        noise = jax.random.normal(rng, low_latent.shape).astype(
            low_latent.dtype)
        if training:
            return ddpm.training_chain(low_latent, low_latent, noise)
        return ddpm.sample(low_latent, noise)

    def sample_mixing_latent(self, gen_params, rng: jax.Array,
                             batch: int) -> jnp.ndarray:
        """Draw the (B, n_latent, 512) mixed noise-style latent."""
        k_z, k_flip, k_idx = jax.random.split(rng, 3)
        z = jax.random.normal(k_z, (2, batch, self.style_dim)).astype(
            self.compute_dtype or jnp.float32)
        n_lat = self.generator.n_latent
        mix = jax.random.bernoulli(k_flip, self.mixing_prob)
        idx = jnp.where(
            mix, jax.random.randint(k_idx, (), 1, n_lat), n_lat)
        return self.generator.apply(
            {"params": gen_params}, z, idx,
            method=RestorationNet.map_styles)

    def _cast(self, tree):
        if self.compute_dtype is None:
            return tree
        dt = self.compute_dtype
        return jax.tree.map(
            lambda x: x.astype(dt)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x, tree)

    def prepare_params(self, params, gen_params=None):
        """Pre-cast the bf16-stage param subtrees (frozen decoder +
        RestoreNet / its EMA) ONCE at load time. restore() casts them
        per call otherwise — astype on an already-bf16 leaf traces to a
        no-op, so pre-cast params skip the in-graph weight convert
        (measured 1.4 ms/call of `convert_element_type` HLOs in the
        XProf trace — ~2% of end-to-end). The f32 islands (e4e encoder,
        diffuser) are untouched. Serving should always call this."""
        if self.compute_dtype is None:
            return params if gen_params is None else (params, gen_params)
        out = dict(params)
        out["psp"] = {**params["psp"],
                      "decoder": self._cast(params["psp"]["decoder"])}
        out["generator"] = self._cast(params["generator"])
        if gen_params is None:
            return out
        return out, self._cast(gen_params)

    def restore(self, params, low_imgs: jnp.ndarray, rng: jax.Array,
                gen_params=None, deterministic: bool = True,
                return_sample: bool = False, upto: str = "full"):
        """Full inference path. gen_params overrides params["generator"]
        (e.g. the EMA copy, `restoration_test.py:239-250`).

        return_sample=True also returns the frozen StyleGAN2 decode of the
        diffused latent — the "visual style prompt" image the reference
        dumps as *_sample.png (`restoration_test.py:128-149`).

        With compute_dtype set (bf16), params and activations are cast for
        the whole pipeline and the output is returned in float32.

        upto: cut the pipeline after "encode" | "ddpm" | "decode" | "full".
        Prefixes share this exact code path, so compiled-prefix timing
        diffs attribute latency to each stage without a separate (and
        drift-prone) re-statement of the graph (bench.py stage_ms).
        """
        if gen_params is None:
            gen_params = params["generator"]
        out_dtype = low_imgs.dtype
        dt = self.compute_dtype
        # Selective f32 islands: the e4e encode and the 4-step DDPM latent
        # chain stay f32 (tiny + latency-bound, and the W+ latent is the
        # most error-amplified tensor in the pipeline); only the two
        # MXU-bound stages — frozen decode and RestoreNet — run in bf16.
        psp_params = params["psp"]
        if dt is not None:
            psp_params = {**psp_params,
                          "decoder": self._cast(psp_params["decoder"])}
            gen_params = self._cast(gen_params)
        k_diff, k_mix, k_noise, k_dec = jax.random.split(rng, 4)
        low_latent = self.psp.get_w_plus(params["psp"], low_imgs)
        if upto == "encode":
            return low_latent
        clean_latent = self.diffuse_latent(params, low_latent, k_diff)
        clean_latent = jax.lax.stop_gradient(clean_latent)
        if upto == "ddpm":
            return clean_latent
        clean_c = clean_latent.astype(dt) if dt is not None else clean_latent
        style_sample, feats = self.psp.decode_with_feats(
            psp_params, clean_c, noise_rng=k_dec)
        feats = jax.lax.stop_gradient(feats)
        # RestoreNet's skip fusion consumes de_feats[1..log2(size)-2] only
        # (`models/RestoreNet.py:1029-1035`: resolutions 8..size); the
        # decoder-resolution taps above `size` are dead and XLA DCEs their
        # convs from the full graph. Slice here so the "decode" prefix
        # times exactly the live subgraph (otherwise the prefix pays for
        # the decoder's top level — e.g. the whole 1024px conv_up — that
        # the full pipeline never executes, skewing stage attribution).
        feats = feats[: self.generator.log_size - 1]
        if upto == "decode":
            # return the feats (what the full graph consumes), NOT the
            # style_sample image: with return_sample=False XLA dead-code
            # eliminates the ToRGB skip cascade, so returning the image
            # here would time work the full pipeline never does
            return feats
        noise_latent = self.sample_mixing_latent(gen_params, k_mix,
                                                 low_imgs.shape[0])
        low_c = low_imgs.astype(dt) if dt is not None else low_imgs
        out = self.generator.apply(
            {"params": gen_params}, low_c, feats, clean_c,
            noise_latent, input_is_latent=True, deterministic=deterministic,
            rngs={"noise": k_noise})
        if return_sample:
            return out.astype(out_dtype), style_sample.astype(out_dtype)
        return out.astype(out_dtype)

    def make_discriminator(self) -> Discriminator:
        return Discriminator(size=self.size,
                             channel_multiplier=self.channel_multiplier,
                             channel_div=self.channel_div)
