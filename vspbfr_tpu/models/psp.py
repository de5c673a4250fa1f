"""pSp facade: frozen style-encoder + frozen StyleGAN2 decoder.

Re-design of `e4e/models/psp.py:73-283` + `Loss/e4e_embedding.py:60-167`.
Functional style: the facade owns module *definitions* and exposes pure
functions over explicit param pytrees, so trainers decide differentiability
by where they put `stop_gradient` (the reference's open/close_decoder_grad
toggles, `e4e/models/psp.py:107-111`, become a no-stop_gradient code path).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from vspbfr_tpu.models.e4e import Encoder4Editing, resize_bilinear_align_corners
from vspbfr_tpu.models.stylegan2 import Generator


def adaptive_avg_pool(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d parity for divisible sizes (1024 -> 512)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    assert h % oh == 0 and w % ow == 0, "adaptive pool needs divisible sizes"
    x = x.reshape(b, oh, h // oh, ow, w // ow, c)
    return jnp.mean(x, axis=(2, 4))


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=False) parity
    (used for the 256 encode resize, `Loss/e4e_embedding.py:88`)."""
    return jax.image.resize(x, (x.shape[0], *out_hw, x.shape[-1]), "linear")


@dataclasses.dataclass
class PSPFacade:
    """Holds module defs + frozen params for encoder/decoder/latent_avg.

    out_size: pipeline resolution (512); size: decoder train size (1024).
    """

    encoder: Encoder4Editing
    decoder: Generator
    out_size: int = 512
    size: int = 1024

    @property
    def n_latent(self) -> int:
        return 2 * int(math.log2(self.size)) - 2       # 18

    @property
    def out_n_latent(self) -> int:
        return 2 * int(math.log2(self.out_size)) - 2   # 16

    @classmethod
    def create(cls, out_size: int = 512, size: int = 1024,
               input_channels: int = 3,
               packed_min_res: int = 512,
               encode_size: int = 256,
               encoder_stages=None,
               channel_div: int = 1) -> "PSPFacade":
        enc_kw = {} if encoder_stages is None else {"stages": tuple(
            tuple(s) for s in encoder_stages)}
        return cls(
            encoder=Encoder4Editing(stylegan_size=size,
                                    input_channels=input_channels,
                                    encode_size=encode_size, **enc_kw),
            decoder=Generator(size=size, packed_min_res=packed_min_res,
                              channel_div=channel_div),
            out_size=out_size,
            size=size,
        )

    def init_params(self, key: jax.Array) -> dict:
        k1, k2, k3 = jax.random.split(key, 3)
        es = self.encoder.encode_size
        enc = self.encoder.init(k1, jnp.zeros((1, es, es, 3)))["params"]
        dec = self.decoder.init(
            {"params": k2, "noise": k3},
            jnp.zeros((1, self.n_latent, 512)),
        )["params"]
        return {
            "encoder": enc,
            "decoder": dec,
            "latent_avg": jnp.zeros((self.n_latent, 512)),
        }

    def get_w_plus(self, params: dict, img: jnp.ndarray) -> jnp.ndarray:
        """Image (B, H, W, 3) in [-1,1] -> (B, n_latent, 512) W+ code.

        Bilinear-resize to 256, encode, add latent_avg, slice to n_latent
        (`Loss/e4e_embedding.py:91-100`, `e4e/models/psp.py:145-165`).
        Always a stop_gradient boundary (torch.no_grad in the reference).
        """
        es = self.encoder.encode_size
        img = resize_bilinear(img, (es, es))
        codes = self.encoder.apply({"params": params["encoder"]}, img)
        codes = codes + params["latent_avg"][None]
        return jax.lax.stop_gradient(codes[:, : self.n_latent])

    def _pooled_from_packed(self) -> bool:
        """face_pool(d2s(packed_rgb)) == phase-mean of the packed RGB when
        the pool is exactly 2x2 (size -> size/2): a 2x2 average over
        d2s output at (i, j) averages the 4 phase values stored at packed
        channel groups (gy, gx, rgb). Skips the full-image HBM relayout
        (measured 4.6 ms at 1024^2 b4 on v5e, scripts/exp_torgb.py)."""
        pmr = self.decoder.packed_min_res
        return bool(pmr) and self.size >= pmr and self.out_size * 2 == self.size

    def _decode_image(self, params: dict, codes: jnp.ndarray, noise, rngs,
                      return_features: bool, resize: bool):
        if resize and self._pooled_from_packed():
            packed, feats = self.decoder.apply(
                {"params": params["decoder"]}, codes, noise=noise,
                return_features=return_features, return_packed_rgb=True,
                rngs=rngs)
            b, h, w, _ = packed.shape
            image = jnp.mean(packed.reshape(b, h, w, 4, 3), axis=3)
            return image, feats
        image, feats = self.decoder.apply(
            {"params": params["decoder"]}, codes, noise=noise,
            return_features=return_features, rngs=rngs)
        if resize:
            image = adaptive_avg_pool(image, (self.out_size, self.out_size))
        return image, feats

    def decode_with_feats(self, params: dict, codes: jnp.ndarray,
                          noise_rng: jax.Array | None = None,
                          noise=None, resize: bool = True):
        """W+ code -> (image, per-resolution features[:out_n_latent])
        (`e4e/models/psp.py:235-281`). Differentiability is the caller's
        choice: wrap with stop_gradient for the frozen-eval path."""
        rngs = {"noise": noise_rng} if noise_rng is not None else None
        image, feats = self._decode_image(params, codes, noise, rngs,
                                          return_features=True, resize=resize)
        return image, feats[: self.out_n_latent]

    def decode(self, params: dict, codes: jnp.ndarray,
               noise_rng: jax.Array | None = None, noise=None,
               resize: bool = True) -> jnp.ndarray:
        """W+ code -> image only (get_stylegan_featsV2 return_feat=False)."""
        rngs = {"noise": noise_rng} if noise_rng is not None else None
        image, _ = self._decode_image(params, codes, noise, rngs,
                                      return_features=False, resize=resize)
        return image

    def mean_latent(self, params: dict, key: jax.Array,
                    n_samples: int = 4096) -> jnp.ndarray:
        """Average mapped w over random z (`e4e/models/psp.py:186-196`)."""
        z = jax.random.normal(key, (n_samples, 512))
        w = self.decoder.apply({"params": params["decoder"]}, z,
                               method=Generator.map_latent)
        return jnp.mean(w, axis=0, keepdims=True)

    def noise_mapping(self, params: dict, styles: jnp.ndarray,
                      inject_index=None) -> jnp.ndarray:
        """z styles (S, B, 512) -> mixed (B, n_latent, 512) w latent via the
        decoder's style MLP (`e4e/models/psp.py:190-223`)."""
        from vspbfr_tpu.models.layers import styles_to_latent
        mapped = jnp.stack([
            self.decoder.apply({"params": params["decoder"]}, styles[s],
                               method=Generator.map_latent)
            for s in range(styles.shape[0])
        ])
        return styles_to_latent(mapped, self.n_latent, inject_index)
