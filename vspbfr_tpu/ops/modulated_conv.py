"""StyleGAN2 modulated convolution, TPU-first formulation. NHWC / HWIO.

The reference's fused path builds a per-sample weight tensor and runs a
groups=batch convolution (`models/RestoreNet.py:509-554`) — efficient on CUDA,
hostile to the TPU MXU (tiny per-group contractions). We use the
mathematically identical input-scaled formulation (the reference's own
non-fused path, `models/RestoreNet.py:481-508`):

    y = demod(style) * conv(x * style, scale * W)

where demod is computed from the modulated weight norm. Exact in infinite
precision; validated against the grouped form to ~1e-5 in tests
(SURVEY.md §7 risk list).

Supports dilation (SMART layers), up (transpose stride-2 + blur) and down
(blur + stride-2) variants with the reference's Blur pad arithmetic
(`models/RestoreNet.py:297-312`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vspbfr_tpu.ops.upfirdn2d import blur as _blur

_DN = ("NHWC", "HWIO", "NHWC")


def conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1, padding=0,
           dilation: int = 1, groups: int = 1) -> jnp.ndarray:
    """Plain conv, NHWC x HWIO -> NHWC. padding: int or ((t,b),(l,r))."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=_DN,
        feature_group_count=groups,
    )


def conv_transpose2d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 2,
                     padding: int = 0, dilation: int = 1) -> jnp.ndarray:
    """torch-semantics conv_transpose2d for HWIO weight (I=c_in, O=c_out).

    out_size = (in-1)*stride - 2*padding + dilation*(k-1) + 1, implemented as
    an lhs-dilated convolution with a spatially flipped kernel.
    """
    kh, kw = w.shape[0], w.shape[1]
    # Transposed conv == lhs-dilated direct conv with the spatially flipped
    # kernel; the contraction stays over c_in, which is already HWIO's I axis.
    wf = jnp.flip(w, (0, 1))
    ph = dilation * (kh - 1) - padding
    pw = dilation * (kw - 1) - padding
    return jax.lax.conv_general_dilated(
        x, wf.astype(x.dtype),
        window_strides=(1, 1),
        padding=((ph, ph), (pw, pw)),
        lhs_dilation=(stride, stride),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=_DN,
    )


def demod_coeffs(w: jnp.ndarray, style: jnp.ndarray, scale: float,
                 eps: float = 1e-8) -> jnp.ndarray:
    """Per-(sample, out-channel) demodulation rsqrt(sum((scale*W*s)^2)+eps).

    w: (kh, kw, c_in, c_out), style: (B, c_in). Returns (B, c_out).
    Matches `models/RestoreNet.py:484-487` / `:375-378`.
    """
    # sum over kh, kw, c_in of (scale * w * s)^2
    w2 = (scale * w) ** 2                       # (kh, kw, cin, cout)
    w2sum = jnp.sum(w2, axis=(0, 1))            # (cin, cout)
    denom = (style ** 2) @ w2sum                # (B, cout)
    return jax.lax.rsqrt(denom + eps)


def modulated_conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    style: jnp.ndarray,
    *,
    demodulate: bool = True,
    up: bool = False,
    down: bool = False,
    dilation: int = 1,
    blur_kernel: jnp.ndarray | None = None,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Style-modulated conv. x: (B,H,W,Cin), w: (kh,kw,Cin,Cout), style: (B,Cin).

    `style` is the already-affine-mapped modulation vector (the reference's
    `modulation(style)`); scale = 1/sqrt(fan_in) is applied internally.
    """
    kh, kw, c_in, c_out = w.shape
    assert kh == kw, "square kernels only"
    k = kh
    fan_in = c_in * k * k
    scale = 1.0 / (fan_in ** 0.5)

    if demodulate:
        d = demod_coeffs(w, style, scale, eps)  # (B, c_out)

    xs = x * style[:, None, None, :]
    ws = scale * w

    if up:
        out = conv_transpose2d(xs, ws, stride=2, padding=0, dilation=dilation)
        if blur_kernel is not None:
            factor = 2
            klen = len(blur_kernel) if isinstance(blur_kernel, (tuple, list)) else blur_kernel.shape[0]
            p = (klen - factor) - (k - 1) * dilation
            pad0 = (p + 1) // 2 + factor - 1
            pad1 = p // 2 + 1
            out = _blur(out, blur_kernel, pad=(pad0, pad1), upsample_factor=factor)
    elif down:
        factor = 2
        klen = len(blur_kernel) if isinstance(blur_kernel, (tuple, list)) else blur_kernel.shape[0]
        p = (klen - factor) + (k - 1)
        pad0 = (p + 1) // 2
        pad1 = p // 2
        xs = _blur(xs, blur_kernel, pad=(pad0, pad1))
        out = conv2d(xs, ws, stride=2, padding=0, dilation=dilation)
    else:
        padding = ((k - 1) * dilation) // 2
        out = conv2d(xs, ws, stride=1, padding=padding, dilation=dilation)

    if demodulate:
        out = out * d[:, None, None, :]
    return out
