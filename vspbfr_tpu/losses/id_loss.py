"""ArcFace identity loss over a ResNet-101 embedder, flax re-implementation.

Re-design of `Loss/id_loss.py`: a torchvision-style resnet101 with a
256-dim head (`resnet101(num_classes=256)`), frozen; both images are
bilinear-resized to 112, embedded, L2-normalized, and the loss is
L1(1, <z_x, z_y>) with the source embedding detached
(`Loss/id_loss.py:20-46`). Weights convert from `Arcface.pth`.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from vspbfr_tpu.models.e4e import FrozenBatchNorm
from vspbfr_tpu.models.psp import resize_bilinear

# torchvision ResNet-101: bottleneck counts per stage
RESNET101_STAGES = ((64, 3), (128, 4), (256, 23), (512, 3))
EXPANSION = 4


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    project: bool = False
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dt = self.compute_dtype
        out_ch = self.planes * EXPANSION
        identity = x
        if self.project:
            identity = nn.Conv(out_ch, (1, 1), strides=self.stride,
                               use_bias=False, dtype=dt,
                               name="down_conv")(x)
            identity = FrozenBatchNorm(out_ch, name="down_bn")(identity)
        h = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=dt,
                    name="conv1")(x)
        h = FrozenBatchNorm(self.planes, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=dt, name="conv2")(h)
        h = FrozenBatchNorm(self.planes, name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=dt,
                    name="conv3")(h)
        h = FrozenBatchNorm(out_ch, name="bn3")(h)
        return nn.relu(h + identity)


class ResNet101Embedder(nn.Module):
    """torchvision resnet101(num_classes=embed_dim), inference form.

    compute_dtype (e.g. bf16) applies to the conv trunk; the global-pool
    reduction and the fc head stay f32 (mixed-precision islands)."""

    embed_dim: int = 256
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        h = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.compute_dtype, name="stem_conv")(x)
        h = FrozenBatchNorm(64, name="stem_bn")(h)
        h = nn.relu(h)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        in_planes = 64
        for s, (planes, blocks) in enumerate(RESNET101_STAGES):
            for b in range(blocks):
                stride = 2 if (b == 0 and s > 0) else 1
                project = b == 0 and (stride != 1 or in_planes != planes * EXPANSION)
                h = Bottleneck(planes, stride, project,
                               compute_dtype=self.compute_dtype,
                               name=f"layer{s + 1}_{b}")(h)
            in_planes = planes * EXPANSION
        h = jnp.mean(h.astype(jnp.float32), axis=(1, 2))
        return nn.Dense(self.embed_dim, name="fc")(h)


def embed_l2(embedder_apply, params, img: jnp.ndarray) -> jnp.ndarray:
    """Resize 112 -> embed -> unit-normalize (`Loss/id_loss.py:27-30`)."""
    z = embedder_apply({"params": params}, resize_bilinear(img, (112, 112)))
    return z / jnp.linalg.norm(z, axis=-1, keepdims=True)


def id_loss(embedder_apply, params, fake: jnp.ndarray,
            real: jnp.ndarray) -> jnp.ndarray:
    """L1(1, <z_fake, z_real>) with the real embedding detached."""
    z_fake = embed_l2(embedder_apply, params, fake)
    z_real = jax.lax.stop_gradient(embed_l2(embedder_apply, params, real))
    inner = jnp.sum(z_fake * z_real, axis=-1)
    return jnp.mean(jnp.abs(1.0 - inner))
