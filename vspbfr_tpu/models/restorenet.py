"""RestoreNet: SMART-layer U-Net restoration generator + StyleGAN2 discriminator.

Re-design of `models/RestoreNet.py:791-1265`. Dataflow (SURVEY.md §3C):

  z noise -> style MLP -> mixing -> noise_latent (B, 16, 512)
  latent = concat(diffused W+ [:16], noise_latent) -> (B, 16, 1024)
  encoder (driven by flipped latent + reversed noise): LargeConvLayer stem ->
    7x [SMART, StyledConv_down] 512->4 -> LargeConvLayer -> x_global (B, 1024)
    -> final_transfer re-injected at 4x4; skip features collected pre-down.
  decoder: SMART @4x4, then 7x [StyledConv up, +enc_feat +stylegan_feat,
    SMART, ToRGB skip] to 512^2. Per-layer decoder style =
    concat(latent[:, i] (1024), x_global (1024)) = 2048 = 4*style_dim;
    encoder styles use the 1024-dim latent alone (2*style_dim), in flipped
    layer order (`models/RestoreNet.py:997-1019`).
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from vspbfr_tpu.models.layers import (
    BLUR_KERNEL_DEFAULT,
    ConvLayer,
    EqualLinear,
    LargeConvLayer,
    ResBlock,
    SMARTLayer,
    StyledConv,
    StyleMLP,
    ToRGB,
    minibatch_stddev,
    styles_to_latent,
)
from vspbfr_tpu.models.stylegan2 import channel_dict


class RestorationNet(nn.Module):
    size: int = 512
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    channel_div: int = 1  # dry-run narrowing knob, see stylegan2.channel_dict
    blur_kernel: Sequence[int] = BLUR_KERNEL_DEFAULT
    # Space-to-depth packed layout for resolutions >= this (see
    # stylegan2.Generator.packed_min_res). The frozen decoder feeding
    # de_feats must use the same threshold. Must stay above 4 (the 4x4
    # stem/global head is never packed); 0 disables.
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
        self._ch = ch
        self.style = StyleMLP(self.style_dim, self.n_mlp)

        pmr = self.packed_min_res or (2 * self.size)
        if 0 < pmr <= 4:
            raise ValueError("packed_min_res must be > 4 (4x4 head unpacked)")

        # decoder (`models/RestoreNet.py:824-879`)
        self.conv1 = SMARTLayer(ch[4], blur_kernel=self.blur_kernel)
        self.to_rgb1 = ToRGB(upsample=False)
        convs, to_rgbs = [], []
        for i in range(3, self.log_size + 1):
            res = 2 ** i
            out_ch = ch[res]
            pk_in = (res // 2) >= pmr
            pk_out = res >= pmr
            convs.append(StyledConv(out_ch, 3, upsample=True,
                                    blur_kernel=self.blur_kernel,
                                    packed_in=pk_in, packed_out=pk_out))
            convs.append(SMARTLayer(out_ch, blur_kernel=self.blur_kernel,
                                    packed=pk_out))
            to_rgbs.append(ToRGB(blur_kernel=self.blur_kernel,
                                 packed=pk_out, skip_packed=pk_in))
        self.convs = convs
        self.to_rgbs = to_rgbs

        # encoder (`models/RestoreNet.py:887-912`)
        self.down_from_big = LargeConvLayer(ch[self.size], kernel_size=1,
                                            packed=self.size >= pmr)
        enc = []
        for i in range(self.log_size, 2, -1):
            res = 2 ** i
            tmp_ch = ch[res]
            out_ch = ch[2 ** (i - 1)]
            enc.append(SMARTLayer(tmp_ch, blur_kernel=self.blur_kernel,
                                  packed=res >= pmr))
            # packed->packed downsample (blur_down_conv_packed_packed) when
            # the next resolution is still above the packing threshold
            enc.append(StyledConv(out_ch, 3, downsample=True,
                                  blur_kernel=self.blur_kernel,
                                  packed_in=res >= pmr,
                                  packed_out=(res // 2) >= pmr))
        self.encoder_convs = enc
        self.final_layer = LargeConvLayer(ch[4], kernel_size=3)
        self.final_linear = EqualLinear(ch[4] * 2, activation=True)
        self.dropout = nn.Dropout(0.5)
        self.final_transfer = EqualLinear(ch[4] * 4 * 4, activation=True)

    def encoder_forward(self, imgs, latent, noise, deterministic: bool):
        """`models/RestoreNet.py:915-942`. latent: flipped (B, 16, 1024);
        noise: reversed per-layer noise list."""
        b = imgs.shape[0]
        if self.packed_min_res and self.size >= self.packed_min_res:
            from vspbfr_tpu.ops.packed import space_to_depth
            imgs = space_to_depth(imgs)
        out = self.down_from_big(imgs)
        features = []
        for ii in range(0, len(self.encoder_convs), 2):
            out = self.encoder_convs[ii](out, latent[:, ii], noise[ii])
            features.append(out)
            out = self.encoder_convs[ii + 1](out, latent[:, ii], noise[ii + 1])
        out = self.final_layer(out)
        features.append(out)
        x_global = self.final_linear(out.reshape(b, -1))
        x_global = self.dropout(x_global, deterministic=deterministic)
        early = self.final_transfer(x_global).reshape(b, 4, 4, -1)
        features[-1] = features[-1] + early
        return x_global, features[::-1]

    def map_styles(self, styles: jnp.ndarray,
                   inject_index=None) -> jnp.ndarray:
        """(S, B, 512) z -> (B, n_latent, 512) mixed w latent."""
        mapped = jnp.stack([self.style(styles[s]) for s in range(styles.shape[0])])
        return styles_to_latent(mapped, self.n_latent, inject_index)

    def __call__(self, images, de_feats, pre_styles, noise_styles,
                 noise=None, inject_index=None, input_is_latent: bool = False,
                 deterministic: bool = True, return_latents: bool = False):
        """Restore `images` (B, size, size, 3) in [-1, 1].

        Args:
          de_feats: frozen-StyleGAN2 per-resolution features (list; index
            1..7 used at 8..512).
          pre_styles: diffused W+ code (B, >=n_latent, 512).
          noise_styles: (S, B, 512) raw z (S in {1,2}), or a precomputed
            (B, n_latent, 512) latent when input_is_latent.
          noise: optional list of num_layers noise maps (B, 2^r, 2^r, 1);
            None draws from the 'noise' rng (randomize_noise semantics).
          deterministic: disables the encoder head dropout (eval mode).
        """
        if input_is_latent:
            noise_latent = noise_styles
        else:
            noise_latent = self.map_styles(noise_styles, inject_index)
        if noise is None:
            noise = [None] * self.num_layers

        pre_latent = pre_styles[:, : self.n_latent, :]
        latent = jnp.concatenate([pre_latent, noise_latent], axis=-1)

        latent_flipped = jnp.flip(latent, axis=1)
        noise_rev = noise[::-1]
        x_global, features = self.encoder_forward(
            images, latent_flipped, noise_rev, deterministic)

        def sty(i):
            return jnp.concatenate([latent[:, i], x_global], axis=-1)

        out = self.conv1(features[0], sty(0), noise=noise[0])
        skip = self.to_rgb1(out, sty(1))

        i = 1
        for layer_idx in range(0, len(self.convs), 2):
            conv_up = self.convs[layer_idx]
            conv_smart = self.convs[layer_idx + 1]
            to_rgb = self.to_rgbs[layer_idx // 2]
            fusion_index = (i + 1) // 2
            # the `+ enc_feat + de_feat` skip fusion
            # (`models/RestoreNet.py:1029-1035`) rides the up-conv's fused
            # epilogue store instead of a separate 3-read elementwise pass
            out = conv_up(out, sty(i), noise=noise[layer_idx + 1],
                          post_add=(features[fusion_index],
                                    de_feats[fusion_index]))
            out = conv_smart(out, sty(i + 1), noise=noise[layer_idx + 2])
            skip = to_rgb(out, sty(i + 2), skip)
            i += 2

        if self.packed_min_res and self.size >= self.packed_min_res:
            from vspbfr_tpu.ops.packed import depth_to_space
            skip = depth_to_space(skip)

        if return_latents:
            return skip, latent
        return skip


class Discriminator(nn.Module):
    """StyleGAN2 discriminator (`models/RestoreNet.py:1205-1265`)."""

    size: int = 512
    input_channels: int = 3
    channel_multiplier: int = 2
    channel_div: int = 1  # dry-run narrowing knob, see stylegan2.channel_dict
    blur_kernel: Sequence[int] = BLUR_KERNEL_DEFAULT
    stddev_group: int = 4
    stddev_feat: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ch = channel_dict(self.channel_multiplier, self.channel_div)
        log_size = int(math.log2(self.size))
        out = ConvLayer(ch[self.size], 1, name="stem")(x)
        for i in range(log_size, 2, -1):
            out = ResBlock(ch[2 ** (i - 1)], self.blur_kernel,
                           name=f"res_{i}")(out)
        out = minibatch_stddev(out, self.stddev_group, self.stddev_feat)
        out = ConvLayer(ch[4], 3, name="final_conv")(out)
        out = out.reshape(out.shape[0], -1)
        out = EqualLinear(ch[4], activation=True, name="final_linear0")(out)
        return EqualLinear(1, name="final_linear1")(out)
