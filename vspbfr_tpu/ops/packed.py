"""Space-to-depth packed layout for low-channel resolutions (TPU-first).

Motivation (measured on v5e, see scripts/exp_conv_forms.py): XLA conv
throughput collapses when C < 128 because the channel (lane) dimension is
padded to 128 — 3x3 convs at 1024^2 x 32 run at 4 TF/s / 58 GB/s, neither
FLOP- nor bandwidth-bound. The StyleGAN2 512/1024 resolutions (C=64/32)
dominate the restore pipeline (SURVEY.md §3A hot loops).

Fix: store every feature map at such resolutions in a space-to-depth packed
layout — resolution R becomes (B, R/2, R/2, 4C) with phase-major channels
out[..., (2a+b)*C + c] = x[..., 2i+a, 2j+b, c] — and rewrite each conv as ONE
dense conv on the packed tensor with a statically re-scattered kernel:

  * stride-1 k x k conv  -> (k', k', 4Ci, 4Co) packed conv (k' = k//2 + 2)
  * even dilation d      -> feature_group_count=4 conv at dilation d/2
                            (phases never mix when the dilation is even)
  * up-conv + blur       -> the composed transposed kernel
                            (`compose_blur_kernel`) subsampled per output
                            phase: a plain conv emitting 4*Co phase channels
                            (packed output FOR FREE — no interleave at all)
  * blur + stride-2 conv -> composed kernel subsampled per input phase: a
                            plain stride-1 conv consuming the packed input
  * 1x1 conv             -> phases independent, shared weight (einsum)

All transforms happen at apply time on the (tiny) weight tensors, so packed
mode reuses the exact same parameters/checkpoints as the unpacked path and
every op stays an ordinary XLA conv (differentiable to any order — R1 safe).

The reference implements these resolutions as CUDA grouped/dilated convs +
upfirdn2d (`models/RestoreNet.py:421-555`, `op/upfirdn2d_kernel.cu`); the
packed layout is the TPU-native re-design, exact in infinite precision.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(x, wp, pady, padx, in_scale=None, epi=None):
    """Stride-1 dense conv via the gated Pallas fast path
    (ops/pallas_conv.py) with XLA fallback. in_scale: (B, C_in_packed)
    per-sample scale folded into the kernel's input stripe. epi: optional
    styled-conv epilogue dict (out_scale/noise/bias/act/post_add) fused
    into the conv's store (ops/pallas_conv.py conv2d_dense_epilogue)."""
    from vspbfr_tpu.ops.pallas_conv import (
        conv2d_dense,
        conv2d_dense_epilogue,
    )
    if epi is not None:
        return conv2d_dense_epilogue(x, wp, (pady, padx), in_scale=in_scale,
                                     **epi)
    return conv2d_dense(x, wp, (pady, padx), in_scale=in_scale)


def _epi_after(out, epi):
    """Apply an epilogue dict on an already-computed conv output (the
    paths whose final op is not a fusable dense conv)."""
    if epi is None:
        return out
    from vspbfr_tpu.ops.pallas_conv import _epi_ref
    return _epi_ref(out, epi.get("out_scale"), epi.get("noise"),
                    epi.get("bias"), epi.get("act", True),
                    epi.get("post_add", ()), epi.get("noise2"),
                    epi.get("bias2"), epi.get("act2", False))


# ---------------------------------------------------------------------------
# layout converters
# ---------------------------------------------------------------------------

def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, 2h, 2w, C) -> (B, h, w, 4C), phase-major: out[..., (2a+b)*C + c]
    = x[..., 2i+a, 2j+b, c]."""
    b, hh, ww, c = x.shape
    h, w = hh // 2, ww // 2
    x = x.reshape(b, h, 2, w, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))    # (b, h, w, 2, 2, c)
    return x.reshape(b, h, w, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of space_to_depth: (B, h, w, 4C) -> (B, 2h, 2w, C)."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))    # (b, h, 2, w, 2, c)
    return x.reshape(b, 2 * h, 2 * w, c)


def pack_vector(v: jnp.ndarray) -> jnp.ndarray:
    """Tile a per-channel vector (bias / style / demod row) across the 4
    phase groups: (..., C) -> (..., 4C) matching the phase-major layout."""
    return jnp.concatenate([v, v, v, v], axis=-1)


# ---------------------------------------------------------------------------
# packed-kernel assembly
#
# Every op below is, per spatial axis, of the form
#     y[o] = sum_t  D[t] * x[alpha*o + t - off]
# with (alpha, off) = (1, pad) for stride-1 convs, (2, pad) for strided
# convs; transposed convs are y[j] = sum_i D[j + c0 - 2i] * x[i]. Writing
# in/out coordinates as 2*grid + phase turns each case into a plain conv on
# the half grid whose kernel taps are D re-indexed by phase — assembled here
# with static scatters over the (small) weight tensor.
# ---------------------------------------------------------------------------


def _assemble2(d2: jnp.ndarray, map_y, map_x, n_in_ph: int,
               n_out_ph: int) -> tuple[jnp.ndarray, tuple, tuple]:
    """2D packed-kernel assembly with independent per-axis maps.

    map_y/map_x: (a, e) -> list of (u, t). Phases combine row-major:
    in-channel group = in_y_phase * n_in_ph_x + in_x_phase, same for out.
    n_in_ph / n_out_ph: per-axis phase counts (1, 2, or 4).

    Returns (kernel (KpY, KpX, n_in_ph^2*Ci, n_out_ph^2*Co), pad_y, pad_x).
    """
    ci, co = d2.shape[2], d2.shape[3]

    def collect(m):
        out, us = {}, []
        for a in range(n_out_ph):
            for e in range(n_in_ph):
                lst = m(a, e)
                out[(a, e)] = lst
                us += [u for (u, _) in lst]
        return out, (min(us), max(us))

    my, (y0, y1) = collect(map_y)
    mx, (x0, x1) = collect(map_x)
    kpy, kpx = y1 - y0 + 1, x1 - x0 + 1

    wp = jnp.zeros((kpy, kpx, n_in_ph * n_in_ph * ci,
                    n_out_ph * n_out_ph * co), d2.dtype)
    for (ay, ey), ly in my.items():
        for (ax, ex), lx in mx.items():
            ein = (ey * n_in_ph + ex) * ci
            aout = (ay * n_out_ph + ax) * co
            for (uy, ty) in ly:
                for (ux, tx) in lx:
                    wp = wp.at[uy - y0, ux - x0,
                               ein:ein + ci, aout:aout + co].add(d2[ty, tx])
    return wp, (-y0, y1), (-x0, x1)


def _map_s1(k: int, pad: int, dil: int = 1):
    """Stride-1 conv y[o] = sum_t D[t] x[o + t*dil - pad], packed in+out
    (phase 2). For odd dilation only (even dilations use grouped convs)."""
    def m(a, e):
        out = []
        for t in range(k):
            num = a + t * dil - pad - e
            if num % 2 == 0:
                out.append((num // 2, t))
        return out
    return m


def _map_up(dk: int, c0: int, packed_in: bool):
    """Transposed-stride-2 composed op y[j] = sum_i D[j + c0 - 2i] x[i].

    packed_in=False: in unpacked grid h, out phases a in [0,2) at grid h.
    packed_in=True: in packed (e in [0,2)) grid h/2, out phases A in [0,4)
    at grid h/2 (caller depth-to-spaces the extra factor afterwards).
    """
    if not packed_in:
        def m(a, e):
            # e is always 0 (single input phase)
            out = []
            for t in range(dk):
                num = t - a - c0
                if num % 2 == 0:
                    out.append((-(num // 2), t))   # u = i - ... y[2m+a]: t = 2m+a+c0-2i -> i = m - (t-a-c0)/2
            return out
        return m

    def m(A, e):
        out = []
        for t in range(dk):
            num = t - A - c0 + 2 * e
            if num % 4 == 0:
                out.append((-(num // 4), t))       # t = 4m+A+c0-2(2p+e) -> p = m - (t-A-c0+2e)/4
        return out
    return m


def _map_down(dk: int, pad0: int):
    """Strided composed op y[o] = sum_t D[t] x[2o + t - pad0], packed input
    (e in [0,2)), unpacked output at the same grid."""
    def m(a, e):
        # a is always 0 (single output phase)
        out = []
        for t in range(dk):
            num = t - e - pad0
            if num % 2 == 0:
                out.append((num // 2, t))          # x[2p+e]: 2p+e = 2o+t-pad0 -> u = p-o = (t-pad0-e)/2
        return out
    return m


# ---------------------------------------------------------------------------
# public packed ops
# ---------------------------------------------------------------------------

def conv2d_packed(x: jnp.ndarray, w: jnp.ndarray, dilation: int = 1,
                  groups_hint: bool = True,
                  in_ch_perm: jnp.ndarray | None = None,
                  in_scale: jnp.ndarray | None = None,
                  epi=None) -> jnp.ndarray:
    """Stride-1 'same' conv on a packed tensor == packed(conv(unpacked)).

    x: (B, h, w, 4Ci) packed; w: (k, k, Ci, Co) the UNPACKED kernel.
    Even dilations factorize per phase (phases never mix): lowered as a
    feature_group_count=4 conv at dilation d/2 when groups_hint, else as the
    equivalent dense (zero-padded) kernel.

    in_ch_perm: optional packed-input-channel permutation folded into the
    assembled kernel: the conv consumes x whose channel j carries what the
    packed layout calls channel in_ch_perm[j] (used by SMART to skip the
    branch-concat reshuffle). Odd dilations only.
    """
    k = w.shape[0]
    pad = ((k - 1) * dilation) // 2
    if dilation % 2 == 0:
        assert in_ch_perm is None
        if in_scale is not None and dilation != 2:
            x = x * in_scale[:, None, None, :]
            in_scale = None
        d2 = dilation // 2
        p2 = ((k - 1) * d2) // 2  # the unpacked pad halves on the half grid
        if groups_hint:
            if in_scale is not None:
                x = x * in_scale[:, None, None, :]
            # one group per phase, shared weights: tile Co 4x, block by phase
            wg = jnp.concatenate([w] * 4, axis=-1)  # (k,k,Ci,4Co)
            return _epi_after(jax.lax.conv_general_dilated(
                x, wg.astype(x.dtype), (1, 1),
                ((p2, p2), (p2, p2)), rhs_dilation=(d2, d2),
                dimension_numbers=_DN, feature_group_count=4), epi)
        ci, co = w.shape[2], w.shape[3]
        wd = jnp.zeros((k, k, 4 * ci, 4 * co), w.dtype)
        for ph in range(4):
            wd = wd.at[:, :, ph * ci:(ph + 1) * ci,
                       ph * co:(ph + 1) * co].set(w)
        if d2 == 1:
            return _conv(x, wd, (p2, p2), (p2, p2), in_scale=in_scale,
                         epi=epi)
        if in_scale is not None:
            x = x * in_scale[:, None, None, :]
        return _epi_after(jax.lax.conv_general_dilated(
            x, wd.astype(x.dtype), (1, 1), ((p2, p2), (p2, p2)),
            rhs_dilation=(d2, d2), dimension_numbers=_DN), epi)

    m = _map_s1(k, pad, dilation)
    wp, (py0, py1), (px0, px1) = _assemble2(w, m, m, 2, 2)
    if in_ch_perm is not None:
        wp = jnp.take(wp, jnp.asarray(in_ch_perm), axis=2)
    return _conv(x, wp, (py0, py1), (px0, px1), in_scale=in_scale, epi=epi)


def conv1x1_packed(x: jnp.ndarray, w: jnp.ndarray,
                   in_ch_perm: jnp.ndarray | None = None,
                   in_scale: jnp.ndarray | None = None,
                   epi=None) -> jnp.ndarray:
    """1x1 conv on packed layout: phases map independently with shared
    weights. x: (B,h,w,4Ci), w: (1,1,Ci,Co) or (Ci,Co).

    in_ch_perm: optional packed-input-channel permutation folded into the
    weight (input channel j of x holds packed channel in_ch_perm[j]) —
    lowers as one dense (4Ci, 4Co) matmul instead of the phase-batched
    einsum.

    in_scale: optional (B, 4Ci) per-sample input scale (the modulated-conv
    style multiply), folded into a PER-BATCH weight (B, ..., Ci, Co is
    tiny) instead of materializing x*scale — which costs a full-activation
    HBM round trip (measured 0.4 ms on the 512-res packed ToRGB)."""
    if w.ndim == 4:
        w = w[0, 0]
    b, h, wd, c4 = x.shape
    ci, co = w.shape
    if in_ch_perm is not None:
        full = jnp.zeros((4 * ci, 4 * co), w.dtype)
        for ph in range(4):
            full = full.at[ph * ci:(ph + 1) * ci,
                           ph * co:(ph + 1) * co].set(w)
        full = jnp.take(full, jnp.asarray(in_ch_perm), axis=0)
        if in_scale is not None:
            wb = in_scale[:, :, None].astype(x.dtype) * full.astype(x.dtype)
            return _epi_after(jnp.einsum("bhwc,bco->bhwo", x, wb), epi)
        return _epi_after(x @ full.astype(x.dtype), epi)
    if in_scale is not None:
        wb = (in_scale.reshape(b, 4, ci)[:, :, :, None].astype(x.dtype)
              * w.astype(x.dtype)[None, None])          # (B, 4, Ci, Co)
        out = jnp.einsum("bhwpc,bpco->bhwpo",
                         x.reshape(b, h, wd, 4, ci), wb)
        return _epi_after(out.reshape(b, h, wd, 4 * co), epi)
    out = x.reshape(b, h, wd, 4, ci) @ w.astype(x.dtype)
    return _epi_after(out.reshape(b, h, wd, 4 * co), epi)


def up_conv_blur_packed(x: jnp.ndarray, w: jnp.ndarray, taps: tuple,
                        packed_in: bool,
                        in_scale: jnp.ndarray | None = None,
                        epi=None) -> jnp.ndarray:
    """StyleGAN2 up path (transposed stride-2 conv k=3 + FIR blur with the
    reference pad arithmetic, `models/RestoreNet.py:297-312`) emitting a
    PACKED output at 2x the resolution.

    packed_in=False: x (B, h, w, Ci) unpacked at res h -> (B, h, w, 4Co)
      packed at res 2h. The phase channels fall out of the conv directly —
      upsampling costs zero data movement.
    packed_in=True: x (B, h, w, 4Ci) packed at res 2h -> (B, 2h, 2h, 4Co)
      packed at res 4h (one depth_to_space of the 16-phase conv output).
    """
    from vspbfr_tpu.ops.modulated_conv import compose_blur_kernel

    k = w.shape[0]
    lk = len(taps)
    factor = 2
    d2 = compose_blur_kernel(w, taps, gain=float(factor ** 2))  # (dk,dk,Ci,Co)
    dk = k + lk - 1
    p = (lk - factor) - (k - 1)
    pad0 = (p + 1) // 2 + factor - 1
    c0 = lk - 1 - pad0

    m = _map_up(dk, c0, packed_in)
    if not packed_in:
        wp, (py0, py1), (px0, px1) = _assemble2(d2, m, m, 1, 2)
        # the packed output falls straight out of the conv, so the styled
        # epilogue fuses into its store
        return _conv(x, wp, (py0, py1), (px0, px1), in_scale=in_scale,
                     epi=epi)
    wp, (py0, py1), (px0, px1) = _assemble2(d2, m, m, 2, 4)
    co = w.shape[3]
    # out16 channels from _assemble2 are (Ay*4 + Ax)*Co with A = 2*g + a;
    # permute the KERNEL's output channels to (gy, gx, ay, ax, c) so the
    # g factor depth-to-spaces with the contiguous (ay, ax, c) inner block
    # (Pallas kernel at HBM speed; the old 8D transpose measured 112 GB/s)
    perm = np.empty(16 * co, np.int32)
    for gy in range(2):
        for gx in range(2):
            for ay in range(2):
                for ax in range(2):
                    new = (((gy * 2 + gx) * 2 + ay) * 2 + ax) * co
                    old = (((2 * gy + ay) * 4) + (2 * gx + ax)) * co
                    perm[new:new + co] = np.arange(old, old + co)
    wp = jnp.take(wp, jnp.asarray(perm), axis=3)
    out16 = _conv(x, wp, (py0, py1), (px0, px1), in_scale=in_scale)
    from vspbfr_tpu.ops.pallas_d2s import interleave_d2s
    return _epi_after(interleave_d2s(out16, 4 * co), epi)


def up_conv_blur_unpacked(x: jnp.ndarray, w: jnp.ndarray,
                          taps: tuple) -> jnp.ndarray:
    """StyleGAN2 up path with UNPACKED in and out: the subpixel composed
    conv (output phases as channel groups) + the Pallas phase interleave.

    x: (B, h, w, Ci) -> (B, 2h, 2w, Co). Replaces the lhs-dilated
    transposed conv + depthwise FIR (both pathological in XLA's TPU
    lowering: 4x-padded intermediates / tiny-minor relayouts).
    """
    from vspbfr_tpu.ops.modulated_conv import compose_blur_kernel
    from vspbfr_tpu.ops.pallas_d2s import interleave_d2s

    k = w.shape[0]
    lk = len(taps)
    factor = 2
    d2 = compose_blur_kernel(w, taps, gain=float(factor ** 2))
    dk = k + lk - 1
    p = (lk - factor) - (k - 1)
    pad0 = (p + 1) // 2 + factor - 1
    c0 = lk - 1 - pad0

    m = _map_up(dk, c0, False)
    wp, (py0, py1), (px0, px1) = _assemble2(d2, m, m, 1, 2)
    out4 = _conv(x, wp, (py0, py1), (px0, px1))  # channels (gy, gx, Co)
    return interleave_d2s(out4, w.shape[3])


def blur_down_conv_packed(x: jnp.ndarray, w: jnp.ndarray, taps: tuple,
                          in_scale: jnp.ndarray | None = None,
                          epi=None) -> jnp.ndarray:
    """StyleGAN2 down path (FIR blur + stride-2 conv,
    `models/RestoreNet.py:398-418`) consuming a PACKED input.

    x: (B, h, w, 4Ci) packed at res 2h -> (B, h, w, Co) unpacked at res h.
    The stride-2 subsampling cancels against the packing: one stride-1 conv.
    """
    from vspbfr_tpu.ops.modulated_conv import compose_blur_kernel

    k = w.shape[0]
    lk = len(taps)
    factor = 2
    e2 = compose_blur_kernel(w, taps, gain=1.0)
    dk = k + lk - 1
    p = (lk - factor) + (k - 1)
    pad0 = (p + 1) // 2

    m = _map_down(dk, pad0)
    wp, (py0, py1), (px0, px1) = _assemble2(e2, m, m, 2, 1)
    return _conv(x, wp, (py0, py1), (px0, px1), in_scale=in_scale, epi=epi)


def blur_down_conv_packed_packed(x: jnp.ndarray, w: jnp.ndarray, taps: tuple,
                                 in_scale: jnp.ndarray | None = None,
                                 epi=None) -> jnp.ndarray:
    """StyleGAN2 down path consuming a PACKED input and emitting a PACKED
    output (both resolutions above packed_min_res).

    x: (B, h, w, 4Ci) packed at res 2h -> (B, h/2, w/2, 4Co) packed at res h.
    Derivation: y[2q+a] = sum_t D[t] x_orig[4q + 2a + t - pad0] with
    x_orig[2p+e] = packed phase e -> p = 2q + a + (t - pad0 - e)/2, i.e. ONE
    stride-2 dense conv on the packed grids (no layout conversion at all).
    Lifts the round-1 `packed_min_res < size` restriction
    (`models/restorenet.py` encoder downsample).
    """
    from vspbfr_tpu.ops.modulated_conv import compose_blur_kernel

    k = w.shape[0]
    lk = len(taps)
    factor = 2
    e2 = compose_blur_kernel(w, taps, gain=1.0)
    dk = k + lk - 1
    p = (lk - factor) + (k - 1)
    pad0 = (p + 1) // 2

    def m(a, e):
        out = []
        for t in range(dk):
            num = t - pad0 - e
            if num % 2 == 0:
                out.append((a + num // 2, t))
        return out

    wp, (py0, py1), (px0, px1) = _assemble2(e2, m, m, 2, 2)
    if in_scale is not None:
        x = x * in_scale[:, None, None, :]
    # out[q] = sum_u K[u - u0] x[2q + u], u in [u0, u1]; with stride 2 and
    # pads (-u0, u1 - 1) the output grid is exactly h/2 (h even)
    return _epi_after(jax.lax.conv_general_dilated(
        x, wp.astype(x.dtype), window_strides=(2, 2),
        padding=((py0, py1 - 1), (px0, px1 - 1)),
        dimension_numbers=_DN), epi)


def upsample2d_packed(x: jnp.ndarray, taps: tuple,
                      packed_in: bool) -> jnp.ndarray:
    """FIR 2x upsample (`models/RestoreNet.py:43-60`) emitting packed output;
    used by the ToRGB skip chain. Channels map independently (depthwise FIR
    lowered as a dense kernel with diagonal channel blocks — C here is the
    RGB skip, 3 or 12 channels, so the dense form is tiny)."""
    lk = len(taps)
    factor = 2
    t = np.asarray(taps, np.float64)
    k2 = np.outer(t, t)
    k2 = k2 / k2.sum() * factor ** 2
    c = x.shape[-1] // (4 if packed_in else 1)
    eye = np.eye(c)
    d2 = jnp.asarray(k2[:, :, None, None] * eye[None, None], x.dtype)
    p = lk - factor
    pad0 = (p + 1) // 2 + factor - 1
    c0 = lk - 1 - pad0

    m = _map_up(lk, c0, packed_in)
    if not packed_in:
        wp, (py0, py1), (px0, px1) = _assemble2(d2, m, m, 1, 2)
        return _conv(x, wp, (py0, py1), (px0, px1))
    wp, (py0, py1), (px0, px1) = _assemble2(d2, m, m, 2, 4)
    perm = np.empty(16 * c, np.int32)
    for gy in range(2):
        for gx in range(2):
            for ay in range(2):
                for ax in range(2):
                    new = (((gy * 2 + gx) * 2 + ay) * 2 + ax) * c
                    old = (((2 * gy + ay) * 4) + (2 * gx + ax)) * c
                    perm[new:new + c] = np.arange(old, old + c)
    wp = jnp.take(wp, jnp.asarray(perm), axis=3)
    out16 = _conv(x, wp, (py0, py1), (px0, px1))
    from vspbfr_tpu.ops.pallas_d2s import interleave_d2s
    return interleave_d2s(out16, 4 * c)
