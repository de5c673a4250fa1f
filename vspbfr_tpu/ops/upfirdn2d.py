"""upfirdn2d: upsample -> FIR filter -> downsample -> crop, NHWC, TPU-native.

This is the StyleGAN2 resampling primitive. The reference implements it as a
hand-tiled CUDA kernel (`op/upfirdn2d_kernel.cu:107-207`) with a Python
autograd wrapper whose backward is another upfirdn2d with flipped kernel
(`op/upfirdn2d.py:217-343`). On TPU the whole operation is exactly one XLA
convolution:

    zero-insertion upsample  -> lhs_dilation=(up, up)
    pad / crop (negative ok) -> XLA conv padding (supports negative values)
    FIR filter (true conv)   -> depthwise conv with spatially flipped kernel
    downsample               -> window_strides=(down, down)

so we let XLA schedule it onto the VPU/MXU and get arbitrary-order
differentiation for free (needed by the R1 penalty, `restoration_train.py:66-73`).

Semantics match the reference `upfirdn2d_native` (`op/upfirdn2d.py:365-406`)
including asymmetric/negative 4-tuple pads used by ADA
(`non_leaking.py:879-905`). One subtlety: the reference upsample appends
(up-1) trailing zero rows/cols, XLA lhs_dilation does not — compensated by
adding (up-1) to the trailing pads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def make_resample_kernel(k) -> jnp.ndarray:
    """Build a normalized 2D FIR kernel from a 1D tap list (outer product).

    Mirrors `make_kernel` (`models/RestoreNet.py:32-40`).
    """
    k = jnp.asarray(k, dtype=jnp.float32)
    if k.ndim == 1:
        k = jnp.outer(k, k)
    return k / jnp.sum(k)


def _normalize_pad(pad) -> tuple[int, int, int, int]:
    """Return (pad_x0, pad_x1, pad_y0, pad_y1) from a 2- or 4-tuple."""
    pad = tuple(int(p) for p in pad)
    if len(pad) == 2:
        return pad[0], pad[1], pad[0], pad[1]
    if len(pad) == 4:
        return pad
    raise ValueError(f"pad must have 2 or 4 elements, got {pad}")


def _resample_matrix(n_in: int, taps: tuple, up: int, down: int,
                     pad0: int, pad1: int) -> np.ndarray:
    """(n_out, n_in) banded matrix applying one axis of upfirdn:
    out[o] = sum_t flip(taps)[t] * padded_upsampled[o*down + t]."""
    k = len(taps)
    n_out = (n_in * up + pad0 + pad1 - k) // down + 1
    o = np.arange(n_out)[:, None]
    t = np.arange(k)[None, :]
    j = o * down + t - pad0
    src = j // up
    valid = (j >= 0) & (j % up == 0) & (src >= 0) & (src < n_in)
    m = np.zeros((n_out, n_in), np.float32)
    kf = np.asarray(taps, np.float64)[::-1]
    np.add.at(m, (np.broadcast_to(o, j.shape)[valid],
                  np.clip(src, 0, n_in - 1)[valid]),
              np.broadcast_to(kf, j.shape)[valid])
    return m


def _fir_axis_stencil(x: jnp.ndarray, taps: tuple, axis: int, up: int,
                      down: int, pad0: int, pad1: int) -> jnp.ndarray:
    """One upfirdn axis as shifted adds (+ phase interleave for up=2).

    XLA lowers lhs-dilated depthwise convs into massively padded
    intermediates on TPU (measured: 4x memory expansion, 0.4 TFLOP/s, OOM at
    1024^2); this formulation is pure slicing + elementwise math that the
    VPU streams at bandwidth rate. Supports up in {1,2}, any down, negative
    pads (crop). taps are applied as true convolution (flipped).
    """
    n_in = x.shape[axis]
    k = len(taps)
    kf = tuple(taps[::-1])
    n_out = (n_in * up + pad0 + pad1 - k) // down + 1
    margin = k + max(0, -min(0, pad0)) + 4

    xp = _pad_axis(x, axis, margin, margin)

    def shifted(start, length, stride=1):
        return jax.lax.slice_in_dim(xp, start, start + (length - 1) * stride + 1,
                                    stride=stride, axis=axis)

    if up == 1:
        out = None
        for t in range(k):
            start = -pad0 + margin + t
            term = kf[t] * shifted(start, n_out, down)
            out = term if out is None else out + term
        return out

    assert up == 2 and down == 1, "stencil path covers up<=2, down folded in up==1 branch"
    # phase c covers output positions j = c + 2*i; tap t contributes when
    # (j - pad0 + t) is even, reading x[(j - pad0 + t)//2]
    n_phase = [(n_out - c + 1) // 2 for c in (0, 1)]
    n_max = max(n_phase)
    phases = []
    for c in (0, 1):
        acc = None
        for t in range(k):
            if (c - pad0 + t) % 2 != 0:
                continue
            off = (c - pad0 + t) // 2
            term = kf[t] * shifted(off + margin, n_max)
            acc = term if acc is None else acc + term
        if acc is None:
            acc = jnp.zeros_like(shifted(margin, n_max))
        phases.append(acc)
    # interleave: (..., n_max, 2, ...) -> (..., 2*n_max, ...) then trim
    stacked = jnp.stack(phases, axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = 2 * n_max
    out = stacked.reshape(shape)
    return jax.lax.slice_in_dim(out, 0, n_out, axis=axis)


def _pad_axis(x, axis, lo, hi):
    pads = [(0, 0)] * x.ndim
    pads[axis] = (lo, hi)
    return jnp.pad(x, pads)


# Channel threshold below which the matmul form wins (lane utilization):
# depthwise conv with C<32 wastes most of the 128-lane registers, while two
# dense (n_out, n_in) matmuls run on the MXU regardless of C.
_MATMUL_C_MAX = 16


def upfirdn2d_separable(x: jnp.ndarray, taps, up: int = 1, down: int = 1,
                        pad=(0, 0), gain: float = 1.0) -> jnp.ndarray:
    """upfirdn with a static separable kernel outer(taps, taps)/sum(taps)^2.

    Two TPU-friendly execution forms, chosen at trace time:
      * C <= 16 (the RGB/skip chain): per-axis banded matrices contracted on
        the MXU (`_resample_matrix`) — the depthwise form would use 3/128
        lanes.
      * otherwise: two separable 1D depthwise convs (4 taps each vs 16 for
        the 2D form).

    gain multiplies the kernel (the reference's factor**2 for upsampling,
    applied as sqrt per axis).
    """
    taps = tuple(float(t) for t in taps)
    s = sum(taps)
    axis_gain = (gain ** 0.5)
    t1 = tuple(t / s * axis_gain for t in taps)
    px0, px1, py0, py1 = _normalize_pad(pad)
    b, h, w, c = x.shape
    if c <= _MATMUL_C_MAX:
        mv = jnp.asarray(_resample_matrix(h, t1, up, down, py0, py1))
        mh = jnp.asarray(_resample_matrix(w, t1, up, down, px0, px1))
        xf = x.astype(jnp.float32)
        out = jnp.einsum("oh,bhwc->bowc", mv, xf,
                         precision=jax.lax.Precision.HIGHEST)
        out = jnp.einsum("ow,bhwc->bhoc", mh, out,
                         precision=jax.lax.Precision.HIGHEST)
        return out.astype(x.dtype)
    if up <= 2 and down <= 2 and not (up == 2 and down == 2):
        # shift-and-add stencil: avoids XLA's pathological lowering of
        # (lhs-dilated) depthwise convs (4x padded intermediates, OOM at
        # 1024^2; see scripts/microbench_blocks.py)
        if up == 2:
            out = _fir_axis_stencil(x.astype(jnp.float32), t1, 1, 2, 1,
                                    py0, py1)
            out = _fir_axis_stencil(out, t1, 2, 2, 1, px0, px1)
        else:
            out = _fir_axis_stencil(x.astype(jnp.float32), t1, 1, 1, down,
                                    py0, py1)
            out = _fir_axis_stencil(out, t1, 2, 1, down, px0, px1)
        return out.astype(x.dtype)
    kernel2d = make_resample_kernel(list(taps)) * gain
    return upfirdn2d(x, kernel2d, up=up, down=down,
                     pad=(px0, px1, py0, py1))


@functools.partial(jax.jit, static_argnames=("up", "down", "pad"))
def upfirdn2d(x: jnp.ndarray, kernel: jnp.ndarray, up: int = 1, down: int = 1,
              pad=(0, 0)) -> jnp.ndarray:
    """Apply upfirdn to an NHWC tensor.

    Args:
      x: (B, H, W, C) input.
      kernel: (kh, kw) FIR filter (applied as true convolution, i.e. flipped).
      up / down: integer resampling factors (applied to both spatial dims).
      pad: (pad0, pad1) symmetric or (x0, x1, y0, y1) asymmetric padding,
        applied after upsampling; negative values crop.

    Returns:
      (B, (H*up + pady0 + pady1 - kh)//down + 1,
          (W*up + padx0 + padx1 - kw)//down + 1, C) output, same dtype as x.
    """
    px0, px1, py0, py1 = _normalize_pad(pad)
    b, h, w, c = x.shape
    kh, kw = kernel.shape

    # Reference zero-insertion keeps (up-1) trailing zeros per sample; XLA
    # lhs_dilation drops them, so fold them into the trailing pad.
    py1 += up - 1
    px1 += up - 1

    # Depthwise true convolution: flip kernel, share across channels.
    k = jnp.flip(kernel, (0, 1)).astype(jnp.float32)
    k = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO, I=1 (depthwise)

    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        k,
        window_strides=(down, down),
        padding=((py0, py1), (px0, px1)),
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        # Tiny depthwise FIR: bandwidth-bound, so full precision is free and
        # keeps resampling bit-accurate (it feeds every skip/blur path).
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.astype(x.dtype)


def _is_static_taps(kernel) -> bool:
    return isinstance(kernel, (tuple, list)) or (
        isinstance(kernel, np.ndarray) and kernel.ndim == 1)


def upsample2d(x: jnp.ndarray, kernel, factor: int = 2) -> jnp.ndarray:
    """2x (or factor-x) upsample with FIR smoothing (`models/RestoreNet.py:43-60`).

    kernel: static 1D taps (fast separable/matmul path) or a 2D jnp kernel.
    """
    if _is_static_taps(kernel):
        k = len(kernel)
        p = k - factor
        pad0 = (p + 1) // 2 + factor - 1
        pad1 = p // 2
        return upfirdn2d_separable(x, kernel, up=factor, down=1,
                                   pad=(pad0, pad1), gain=float(factor ** 2))
    kernel = kernel * (factor ** 2)
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    return upfirdn2d(x, kernel, up=factor, down=1, pad=(pad0, pad1))


def downsample2d(x: jnp.ndarray, kernel, factor: int = 2) -> jnp.ndarray:
    """FIR anti-aliased downsample (`models/RestoreNet.py:63-81`)."""
    if _is_static_taps(kernel):
        p = len(kernel) - factor
        return upfirdn2d_separable(x, kernel, up=1, down=factor,
                                   pad=((p + 1) // 2, p // 2))
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, kernel, up=1, down=factor, pad=(pad0, pad1))


def blur(x: jnp.ndarray, kernel, pad: tuple[int, int],
         upsample_factor: int = 1) -> jnp.ndarray:
    """Plain FIR blur with explicit pad (`models/RestoreNet.py:84-101`)."""
    if _is_static_taps(kernel):
        return upfirdn2d_separable(x, kernel, pad=pad,
                                   gain=float(upsample_factor ** 2))
    if upsample_factor > 1:
        kernel = kernel * (upsample_factor ** 2)
    return upfirdn2d(x, kernel, pad=pad)


def upfirdn2d_ref(x: np.ndarray, kernel: np.ndarray, up: int = 1, down: int = 1,
                  pad=(0, 0)) -> np.ndarray:
    """Pure-numpy golden reference, NHWC.

    A direct port of the reference CPU oracle `upfirdn2d_native`
    (`op/upfirdn2d.py:365-406`) used only in tests.
    """
    px0, px1, py0, py1 = _normalize_pad(pad)
    b, h, w, c = x.shape
    kh, kw = kernel.shape

    # 1. zero-insertion upsample (keep trailing zeros like the reference)
    out = np.zeros((b, h * up, w * up, c), dtype=np.float64)
    out[:, ::up, ::up, :] = x

    # 2. pad (positive) then crop (negative)
    out = np.pad(
        out,
        ((0, 0), (max(py0, 0), max(py1, 0)), (max(px0, 0), max(px1, 0)), (0, 0)),
    )
    out = out[
        :,
        max(-py0, 0): out.shape[1] - max(-py1, 0),
        max(-px0, 0): out.shape[2] - max(-px1, 0),
        :,
    ]

    # 3. true 2D convolution with the kernel (correlate with flipped kernel)
    kf = np.flip(kernel, (0, 1)).astype(np.float64)
    oh = out.shape[1] - kh + 1
    ow = out.shape[2] - kw + 1
    res = np.zeros((b, oh, ow, c), dtype=np.float64)
    for iy in range(kh):
        for ix in range(kw):
            res += kf[iy, ix] * out[:, iy: iy + oh, ix: ix + ow, :]

    # 4. downsample
    res = res[:, ::down, ::down, :]
    return res.astype(x.dtype)
