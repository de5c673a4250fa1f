"""Custom ops: the TPU-native equivalents of the reference CUDA kernel layer.

Reference layer L1 (`op/upfirdn2d_kernel.cu`, `op/fused_bias_act_kernel.cu`,
`op/conv2d_gradfix.py`) maps here:

  * upfirdn2d      — one XLA `conv_general_dilated` (lhs-dilated, strided,
                     possibly negative padding) plus an optional separable
                     Pallas fast path; fully differentiable (incl. double
                     backward for R1) through JAX autodiff.
  * fused_leaky_relu — bias + leaky-ReLU * sqrt(2); XLA fuses this for free,
                     the op boundary is kept for parity testing and a Pallas
                     variant is provided for the hot decoder path.
  * modulated_conv2d — StyleGAN2 weight (de)modulation in the input-scaled
                     formulation (scale activations by style, shared-weight
                     conv, demodulate outputs), which avoids the
                     groups=batch convolutions of the reference
                     (`models/RestoreNet.py:509-554`) that do not map to the
                     MXU. Mathematically identical to the grouped form.

`conv2d_gradfix` / `no_weight_gradients` from the reference need no
counterpart: `jax.grad` differentiates convs (to any order) natively, and the
R1 penalty takes gradients w.r.t. inputs only by construction.
"""

from vspbfr_tpu.ops.upfirdn2d import (
    make_resample_kernel,
    upfirdn2d,
    upfirdn2d_ref,
    upsample2d,
    downsample2d,
    blur,
)
from vspbfr_tpu.ops.fused_act import fused_leaky_relu, scaled_leaky_relu
from vspbfr_tpu.ops.modulated_conv import (
    conv2d,
    conv_transpose2d,
    modulated_conv2d,
    demod_coeffs,
)

__all__ = [
    "make_resample_kernel",
    "upfirdn2d",
    "upfirdn2d_ref",
    "upsample2d",
    "downsample2d",
    "blur",
    "fused_leaky_relu",
    "scaled_leaky_relu",
    "conv2d",
    "conv_transpose2d",
    "modulated_conv2d",
    "demod_coeffs",
]
