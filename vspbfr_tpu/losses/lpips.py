"""LPIPS perceptual loss (net-lin / VGG16), flax re-implementation.

Re-design of the vendored `my_lpips/` package (`my_lpips/networks_basic.py:27-92`,
`my_lpips/pretrained_networks.py`): ScalingLayer -> VGG16 5-tap features
(relu1_2/2_2/3_3/4_3/5_3) -> channel unit-normalize -> squared diff -> 1x1
calibrated lin layers -> spatial mean -> sum over taps.

Weights (VGG16 conv filters + the v0.1 lin heads from
`my_lpips/weights/v0.1/vgg.pth`) are converted from torch checkpoints via
`vspbfr_tpu.convert`; torchvision is not required at runtime.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

# VGG16 conv plan: (features, n_convs) per block; taps at each block end.
VGG16_BLOCKS = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

# ImageNet-calibrated input affine (`my_lpips/networks_basic.py` ScalingLayer)
_SHIFT = jnp.asarray([-0.030, -0.088, -0.188])
_SCALE = jnp.asarray([0.458, 0.448, 0.450])


class VGG16Features(nn.Module):
    """VGG16 conv trunk returning the 5 LPIPS tap activations (post-ReLU).

    compute_dtype runs the conv stack at that dtype (params stay f32 —
    flax casts for the computation only); taps return in the input dtype.
    """

    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        taps = []
        for b, (feat, n_convs) in enumerate(VGG16_BLOCKS):
            for c in range(n_convs):
                x = nn.Conv(feat, (3, 3), padding=1, name=f"conv{b}_{c}",
                            dtype=self.compute_dtype)(x)
                x = nn.relu(x)
            taps.append(x)
            if b < len(VGG16_BLOCKS) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """Calibrated perceptual distance; inputs are (B, H, W, 3) in [-1, 1].

    Returns per-sample distances (B,). The reference applies `.sum()` /
    `.mean()` at the call sites (`restoration_train.py:236`,
    `code_diffuser_train.py:177`); callers reduce.

    compute_dtype (e.g. bf16) applies to the VGG16 trunk only — the MXU-
    bound 95% of the FLOPs; the unit-normalize, calibrated lin heads and
    spatial reductions stay f32 (mixed-precision islands, ROADMAP r4).
    """

    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        net = VGG16Features(name="vgg", compute_dtype=self.compute_dtype)

        def scaled(v):
            v = (v - _SHIFT) / _SCALE
            if self.compute_dtype is not None:
                v = v.astype(self.compute_dtype)
            return v

        fx = [t.astype(jnp.float32) for t in net(scaled(x))]
        fy = [t.astype(jnp.float32) for t in net(scaled(y))]
        total = 0.0
        for k, (fx_k, fy_k) in enumerate(zip(fx, fy)):
            def unit(v):
                return v / jnp.sqrt(jnp.sum(jnp.square(v), axis=-1,
                                            keepdims=True) + 1e-10)
            diff = jnp.square(unit(fx_k) - unit(fy_k))
            # 1x1 lin head, no bias (`NetLinLayer`)
            w = self.param(f"lin{k}", nn.initializers.ones,
                           (diff.shape[-1], 1))
            d = diff @ w
            total = total + jnp.mean(d, axis=(1, 2))  # spatial average
        return total[:, 0]
