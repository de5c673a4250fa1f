"""StyleGAN2 generator (the frozen FFHQ-1024 decoder of the pipeline).

Re-design of `e4e/models/stylegan2/model.py:367-552` (rosinality StyleGAN2 +
the VSPBFR `return_features` tap collecting per-resolution pre-ToRGB
features). The pipeline always drives it with `input_is_latent=True` W+
codes; style mixing / truncation helpers live in `layers.styles_to_latent`.

Noise: pass `noise` (list of (B,H,W,1) arrays, index = layer) for
deterministic decodes, or leave None and provide a 'noise' rng
(randomize_noise=True semantics).
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from vspbfr_tpu.models.layers import (
    BLUR_KERNEL_DEFAULT,
    StyledConv,
    StyleMLP,
    ToRGB,
)


def channel_dict(channel_multiplier: int = 2,
                 channel_div: int = 1) -> dict[int, int]:
    """Resolution -> channel map (`e4e/models/stylegan2/model.py:395-405`).

    channel_div uniformly narrows the towers (floor 8, preserving the
    4-way-divisibility SMART's branch split needs). It exists for
    compile-budgeted dry-runs: at tiny spatial sizes every live resolution
    sits in the map's flat 512-channel region, so "tiny" graphs otherwise
    still cost ~TFLOPs. 1 (default) is the reference map exactly.
    """
    base = {
        4: 512, 8: 512, 16: 512, 32: 512,
        64: 256 * channel_multiplier,
        128: 128 * channel_multiplier,
        256: 64 * channel_multiplier,
        512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }
    if channel_div == 1:
        return base
    return {k: max(8, v // channel_div) for k, v in base.items()}


class Generator(nn.Module):
    size: int = 1024
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    channel_div: int = 1  # dry-run narrowing knob, see channel_dict
    blur_kernel: Sequence[int] = BLUR_KERNEL_DEFAULT
    # Resolutions >= this run in the space-to-depth packed layout
    # (ops/packed.py): same parameters, ~2x faster on TPU at the C<=64
    # resolutions (measured scripts/exp_packed.py). 0 disables. Feature taps
    # at packed resolutions are returned packed — consumers (RestoreNet)
    # must use the same threshold.
    packed_min_res: int = 512

    @property
    def log_size(self) -> int:
        return int(math.log2(self.size))

    @property
    def n_latent(self) -> int:
        return self.log_size * 2 - 2

    @property
    def num_layers(self) -> int:
        return (self.log_size - 2) * 2 + 1

    def setup(self):
        ch = channel_dict(self.channel_multiplier, self.channel_div)
        self.style = StyleMLP(self.style_dim, self.n_mlp)
        self.input = self.param(
            "const_input", nn.initializers.normal(1.0), (1, 4, 4, ch[4])
        )
        self.conv1 = StyledConv(ch[4], 3, blur_kernel=self.blur_kernel)
        self.to_rgb1 = ToRGB(upsample=False)

        convs, to_rgbs = [], []
        pmr = self.packed_min_res or (2 * self.size)
        for i in range(3, self.log_size + 1):
            res = 2 ** i
            out_ch = ch[res]
            pk_in = (res // 2) >= pmr
            pk_out = res >= pmr
            convs.append(StyledConv(out_ch, 3, upsample=True,
                                    blur_kernel=self.blur_kernel,
                                    packed_in=pk_in, packed_out=pk_out))
            convs.append(StyledConv(out_ch, 3, blur_kernel=self.blur_kernel,
                                    packed_in=pk_out, packed_out=pk_out))
            to_rgbs.append(ToRGB(blur_kernel=self.blur_kernel,
                                 packed=pk_out, skip_packed=pk_in))
        self.convs = convs
        self.to_rgbs = to_rgbs

    def map_latent(self, z: jnp.ndarray) -> jnp.ndarray:
        """z -> w through the style MLP."""
        return self.style(z)

    def __call__(self, latent: jnp.ndarray, noise=None,
                 return_features: bool = False,
                 return_packed_rgb: bool = False):
        """Decode a W+ latent.

        Args:
          latent: (B, n_latent, style_dim) W+ code (input_is_latent=True path).
          noise: optional list of num_layers noise maps (B, 2^r, 2^r, 1).
          return_features: also return the pre-ToRGB feature list
            (`e4e/models/stylegan2/model.py:530-543`): index 0 = 4x4 after
            conv1, then one entry per upsample conv at 8, 16, ... size.
          return_packed_rgb: when the top resolution is packed, skip the
            final depth-to-space and return the (B, size/2, size/2, 12)
            packed RGB (phase groups (gy, gx, rgb)) — consumers that
            immediately 2x-average-pool (pSp face_pool) can take the phase
            mean instead, saving a full-image HBM relayout.

        Returns:
          image (B, size, size, 3) in [-1, 1] range convention, and the
          feature list (or None). Features at resolutions >= packed_min_res
          are in the packed layout (B, r/2, r/2, 4C).
        """
        b = latent.shape[0]
        if noise is None:
            noise = [None] * self.num_layers

        out = jnp.tile(self.input, (b, 1, 1, 1))
        out = self.conv1(out, latent[:, 0], noise=noise[0])
        skip = self.to_rgb1(out, latent[:, 1])

        features = [out] if return_features else None

        i = 1
        for layer_idx in range(0, len(self.convs), 2):
            conv_up = self.convs[layer_idx]
            conv = self.convs[layer_idx + 1]
            to_rgb = self.to_rgbs[layer_idx // 2]
            out = conv_up(out, latent[:, i], noise=noise[layer_idx + 1])
            if return_features:
                features.append(out)
            out = conv(out, latent[:, i + 1], noise=noise[layer_idx + 2])
            skip = to_rgb(out, latent[:, i + 2], skip)
            i += 2

        if self.packed_min_res and self.size >= self.packed_min_res:
            if not return_packed_rgb:
                from vspbfr_tpu.ops.packed import depth_to_space
                skip = depth_to_space(skip)
        return skip, features
