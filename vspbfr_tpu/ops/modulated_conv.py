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
import numpy as np

from vspbfr_tpu.ops.upfirdn2d import blur as _blur

_DN = ("NHWC", "HWIO", "NHWC")


def conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1, padding=0,
           dilation: int = 1, groups: int = 1) -> jnp.ndarray:
    """Plain conv, NHWC x HWIO -> NHWC. padding: int or ((t,b),(l,r))."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    if stride == 1 and dilation == 1 and groups == 1:
        # Pallas fast path for wide stride-1 convs (1.6-2x vs XLA; see
        # ops/pallas_conv.py); falls back to XLA when not profitable
        from vspbfr_tpu.ops.pallas_conv import conv2d_dense
        return conv2d_dense(x, w, padding)
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

    out_size = (in-1)*stride - 2*padding + dilation*(k-1) + 1. The generic
    form is an lhs-dilated convolution with a spatially flipped kernel, but
    XLA's TPU lowering of lhs-dilated convs materializes 4x-padded
    intermediates (measured 3-5x slower + OOM risk), so the hot case
    (stride 2, dilation 1 — every StyleGAN2 up-conv) uses a subpixel phase
    decomposition: 4 small dense convs interleaved by depth-to-space.
    """
    kh, kw = w.shape[0], w.shape[1]
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


def _conv_transpose2d_subpixel(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """stride-2 transposed conv via per-phase convs + interleave.

    out[2m+a, 2n+b] = sum_{s,t} Wf[a+2s, b+2t] x[m-s, n-t] with Wf the
    spatially flipped kernel; each (a, b) phase is a plain <=2x2 dense conv.
    """
    b_, hgt, wid, c_in = x.shape
    kh, kw, _, c_out = w.shape
    w = w.astype(x.dtype)
    oh = (hgt - 1) * 2 + kh
    ow = (wid - 1) * 2 + kw

    phases = []
    for a in range(2):
        row = []
        for bph in range(2):
            # out[2m+a] = sum_s W[2s+a] x[m-s]: phase kernel = the UNFLIPPED
            # weight subsampled at parity a, then spatially reversed for the
            # correlation form (flip-then-subsample swaps parities for even k)
            wp = jnp.flip(w[a::2, bph::2], (0, 1))     # (<=ceil(k/2)^2, cin, cout)
            sy, sx = wp.shape[0], wp.shape[1]
            # output index m reads x[m - s]: left-pad by (sy-1)
            out = jax.lax.conv_general_dilated(
                x, wp, window_strides=(1, 1),
                padding=((sy - 1, sy - 1), (sx - 1, sx - 1)),
                dimension_numbers=_DN)
            row.append(out)
        phases.append(row)

    # each phase output has shape (b, hgt + sy - 1, wid + sx - 1, cout);
    # unify to (b, H, W, cout) with H = hgt + n_ph_y - 1
    Hp = hgt + (kh + 1) // 2 - 1
    Wp = wid + (kw + 1) // 2 - 1
    unif = [[p[:, :Hp, :Wp, :] if p.shape[1] >= Hp and p.shape[2] >= Wp
             else jnp.pad(p, ((0, 0), (0, Hp - p.shape[1]),
                              (0, Wp - p.shape[2]), (0, 0)))
             for p in row] for row in phases]
    # interleave y then x
    rows = [jnp.stack([unif[0][bph], unif[1][bph]], axis=2)
            .reshape(b_, 2 * Hp, Wp, c_out) for bph in range(2)]
    out = jnp.stack(rows, axis=3).reshape(b_, 2 * Hp, 2 * Wp, c_out)
    return out[:, :oh, :ow, :]


def _fused_up_conv_blur(x: jnp.ndarray, w: jnp.ndarray,
                        taps: tuple) -> jnp.ndarray:
    """Fused StyleGAN2 up-path: conv_transpose(stride 2) + FIR blur as ONE
    subpixel transposed conv with the composed kernel.

    1D derivation: y[j] = sum_i x[i] * D[j - pad0 + (lk-1) - 2i] where
    D = correlate(W, flip(K)) has length k + lk - 1 and K carries the blur
    gain factor^2 and normalization; the reference pad arithmetic
    (`models/RestoreNet.py:297-303`) fixes the output window to exactly
    2x the input size. Avoids both the lhs-dilated conv and the depthwise
    blur (XLA lowers each pathologically on TPU).
    """
    b, h, wd, c_in = x.shape
    k = w.shape[0]
    lk = len(taps)
    factor = 2
    # blur kernel with gain, normalized (Blur: make_kernel * factor**2)
    t = np.asarray(taps, np.float64)
    k2d = np.outer(t, t)
    k2d = k2d / k2d.sum() * factor ** 2
    # D[n] = sum_u W[n - (lk-1) + u] * Kf[u], Kf = flip(K)
    # == 2D full correlation of W with flip(K) == convolution of W with K
    kc = jnp.asarray(k2d, w.dtype)
    wj = jnp.transpose(w, (2, 3, 0, 1)).reshape(-1, k, k)[..., None]  # (ci*co, k, k, 1)
    d = jax.lax.conv_general_dilated(
        wj, jnp.flip(kc)[..., None, None],
        window_strides=(1, 1), padding=((lk - 1, lk - 1), (lk - 1, lk - 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )  # (ci*co, k+lk-1, k+lk-1, 1)
    dk = k + lk - 1
    d = d.reshape(c_in, w.shape[3], dk, dk).transpose(2, 3, 0, 1)  # HWIO

    t6 = _conv_transpose2d_subpixel(x, d)  # length 2(h-1) + dk
    # blur pads: p = (lk-factor) - (k-1); pad0 = (p+1)//2 + 1; the composed
    # output window is t6[pad0 ... pad0 + 2h)
    p = (lk - factor) - (k - 1)
    pad0 = (p + 1) // 2 + factor - 1
    off = (lk - 1) - pad0
    return jax.lax.slice(t6, (0, off, off, 0),
                         (b, off + factor * h, off + factor * wd,
                          t6.shape[3]))


def compose_blur_kernel(w: jnp.ndarray, taps: tuple, gain: float = 1.0,
                        flip_taps: bool = False) -> jnp.ndarray:
    """Compose a dense HWIO conv kernel with a separable FIR: returns the
    (k+lk-1)^2 kernel E[m] = sum_u W[m-u] * Kf[u] (full convolution with the
    flipped normalized taps; flip_taps flips them once more)."""
    k = w.shape[0]
    lk = len(taps)
    t = np.asarray(taps, np.float64)
    k2d = np.outer(t, t)
    k2d = k2d / k2d.sum() * gain
    kc = jnp.asarray(k2d, w.dtype)
    if flip_taps:
        kc = jnp.flip(kc)
    wj = jnp.transpose(w, (2, 3, 0, 1)).reshape(-1, k, k)[..., None]
    e = jax.lax.conv_general_dilated(
        wj, kc[..., None, None],
        window_strides=(1, 1), padding=((lk - 1, lk - 1), (lk - 1, lk - 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    dk = k + lk - 1
    return e.reshape(w.shape[2], w.shape[3], dk, dk).transpose(2, 3, 0, 1)


def fused_blur_strided_conv(x: jnp.ndarray, w: jnp.ndarray, taps: tuple,
                            pad: tuple, stride: int = 2,
                            gain: float = 1.0) -> jnp.ndarray:
    """blur(x, taps, pad) then conv(w, stride) as ONE strided conv with the
    composed kernel — removes the depthwise FIR pass entirely (the StyleGAN2
    down path: `models/RestoreNet.py:398-407`, ConvLayer downsample
    `:1143-1150`). The blur pads carry over unchanged to the composed conv."""
    e = compose_blur_kernel(w, taps, gain)
    return jax.lax.conv_general_dilated(
        x, e.astype(x.dtype), window_strides=(stride, stride),
        padding=((pad[0], pad[1]), (pad[0], pad[1])),
        dimension_numbers=_DN)


def modulated_conv2d_d12_packed(x: jnp.ndarray, w1: jnp.ndarray,
                                w2: jnp.ndarray, style: jnp.ndarray,
                                demodulate: bool = True,
                                eps: float = 1e-8) -> jnp.ndarray:
    """SMART's dilation-1 and dilation-2 branches as ONE packed conv.

    On the space-to-depth half grid both branches assemble to a 3x3,
    pad-(1,1) kernel (d=1 mixes phases, d=2 is phase-diagonal at half-grid
    dilation 1), so their assembled kernels concat along the output
    channels into a single (3,3,4C,8Cb) conv — 128 output lanes at
    Cb = C/4, unlocking the Pallas fast path that each 64-lane branch
    missed. Output channels: [d1 phase-major 4Cb | d2 phase-major 4Cb]
    (the branch-major layout SMART's fusion perm consumes).

    x: (B,h,w,4C) packed; w1/w2: (3,3,C,Cb) unpacked branch kernels;
    style: (B,C) modulation. Cites `models/RestoreNet.py:196-209` (the
    rates-[1,2] branch pair of the SMART layer).
    """
    from vspbfr_tpu.ops import packed as pk

    c_in, cb = w1.shape[2], w1.shape[3]
    scale = 1.0 / ((c_in * 9) ** 0.5)
    m = pk._map_s1(3, 1, 1)
    wp1, (py0, py1), (px0, px1) = pk._assemble2(scale * w1, m, m, 2, 2)
    assert (py0, py1, px0, px1) == (1, 1, 1, 1)
    wd2 = jnp.zeros((3, 3, 4 * c_in, 4 * cb), w2.dtype)
    for ph in range(4):
        wd2 = wd2.at[:, :, ph * c_in:(ph + 1) * c_in,
                     ph * cb:(ph + 1) * cb].set(scale * w2)
    wp = jnp.concatenate([wp1, wd2], axis=3)       # (3,3,4C,8Cb)

    sty = pk.pack_vector(style)
    epi = None
    if demodulate:
        # demod folds into the Pallas conv's store (out_scale) instead of
        # a separate full-tensor multiply pass
        d1 = demod_coeffs(w1, style, scale, eps)
        d2 = demod_coeffs(w2, style, scale, eps)
        dv = jnp.concatenate([pk.pack_vector(d1), pk.pack_vector(d2)], -1)
        epi = dict(out_scale=dv, act=False)
    return pk._conv(x, wp, (1, 1), (1, 1), in_scale=sty, epi=epi)


def modulated_conv2d_d48_packed(x: jnp.ndarray, w4: jnp.ndarray,
                                w8: jnp.ndarray, style: jnp.ndarray,
                                demodulate: bool = True,
                                eps: float = 1e-8) -> jnp.ndarray:
    """SMART's dilation-4 and dilation-8 branches as ONE Pallas pair conv.

    On the space-to-depth half grid both branches are phase-diagonal
    (grouped) convs at half-grid dilations 2 and 4; the multi-dilation
    Pallas kernel (ops/pallas_dilated.py) computes them over one shared
    VMEM input stripe with taps-in-N matmuls and 8Cb-lane stores — 2.07x
    (bf16) / 1.81x (f32) over the two block-diagonal dense convs at the
    model shapes (scripts/exp_d48.py on v5e). Output channels:
    [d4 phase-major 4Cb | d8 phase-major 4Cb] (branch-major, matching the
    d1+d2 merge). Cites `models/RestoreNet.py:196-209` (the rates-[4,8]
    branch pair of the SMART layer).
    """
    from vspbfr_tpu.ops import packed as pk
    from vspbfr_tpu.ops.pallas_dilated import dilated_pair_conv

    c_in = w4.shape[2]
    scale = 1.0 / ((c_in * 9) ** 0.5)
    sty = pk.pack_vector(style)
    dv = None
    if demodulate:
        # demod folds into the pair kernel's stores (out_scale)
        d4 = demod_coeffs(w4, style, scale, eps)
        d8 = demod_coeffs(w8, style, scale, eps)
        dv = jnp.concatenate([pk.pack_vector(d4), pk.pack_vector(d8)], -1)
    return dilated_pair_conv(x, scale * w4, scale * w8, 2, 4, groups=4,
                             in_scale=sty, out_scale=dv)


def modulated_conv2d_multi(x: jnp.ndarray, ws, rates, style: jnp.ndarray,
                           demodulate: bool = True,
                           eps: float = 1e-8) -> jnp.ndarray:
    """All of SMART's stride-1 3x3 dilated branches as ONE multi-dilation
    kernel over the unpacked layout (the 256-res-and-below SMART form):
    shared input stripe, per-row taps-in-N matmuls, branch-concat output
    (`models/RestoreNet.py:196-209`). Falls back to the identical XLA
    composition off-TPU / at unprofitable shapes."""
    from vspbfr_tpu.ops.pallas_dilated import dilated_multi_conv

    c_in = ws[0].shape[2]
    k = ws[0].shape[0]
    scale = 1.0 / ((c_in * k * k) ** 0.5)
    dv = None
    if demodulate:
        dv = jnp.concatenate(
            [demod_coeffs(w, style, scale, eps) for w in ws], -1)
    return dilated_multi_conv(x, tuple(scale * w for w in ws), tuple(rates),
                              groups=1, in_scale=style, out_scale=dv)


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


def _modulated_conv2d_packed(
    x: jnp.ndarray,
    w: jnp.ndarray,
    style: jnp.ndarray,
    *,
    demodulate: bool,
    up: bool,
    down: bool,
    dilation: int,
    blur_kernel,
    eps: float,
    packed_in: bool,
    packed_out: bool,
    return_demod: bool = False,
    epilogue=None,
) -> jnp.ndarray:
    """Packed-layout modulated conv (see ops/packed.py). x is (B,h,w,4Ci)
    when packed_in else (B,H,W,Ci); output packed iff packed_out. The math
    is the identical input-scale/conv/demodulate formulation on the
    space-to-depth layout. epilogue (noise/bias/act/post_add): the styled
    epilogue — with the demod scale folded in — fused into the conv's
    store where the lowering ends in a dense Pallas conv."""
    from vspbfr_tpu.ops import packed as pk

    kh, kw, c_in, c_out = w.shape
    k = kh
    scale = 1.0 / ((c_in * k * k) ** 0.5)
    if demodulate:
        d = demod_coeffs(w, style, scale, eps)   # (B, c_out)
    dv = (pk.pack_vector(d) if packed_out else d) if demodulate else None

    sty = pk.pack_vector(style) if packed_in else style
    ws = scale * w
    epi = dict(epilogue, out_scale=dv) if epilogue is not None else None

    # the style multiply rides into the Pallas conv's input stripe
    # (in_scale) where the fast path applies; other paths multiply inline
    if up:
        assert packed_out and dilation == 1
        taps = tuple(blur_kernel)
        out = pk.up_conv_blur_packed(x, ws, taps, packed_in=packed_in,
                                     in_scale=sty, epi=epi)
    elif down:
        assert packed_in and dilation == 1
        if packed_out:
            out = pk.blur_down_conv_packed_packed(x, ws, tuple(blur_kernel),
                                                  in_scale=sty, epi=epi)
        else:
            out = pk.blur_down_conv_packed(x, ws, tuple(blur_kernel),
                                           in_scale=sty, epi=epi)
    else:
        assert packed_in and packed_out
        if k == 1:
            out = pk.conv1x1_packed(x, ws, in_scale=sty, epi=epi)
        else:
            # dense lowering beats XLA's grouped convs at the production
            # widths: grouped d=4/8 branches ran 5-7 TF/s vs 60+ TF/s dense
            # (scripts/exp_smart_ablate.py on v5e at 4C=256); keep grouped
            # only for packed widths >= 512 which no current config hits
            hint = dilation >= 4 and x.shape[-1] >= 512
            out = pk.conv2d_packed(x, ws, dilation=dilation,
                                   groups_hint=hint, in_scale=sty, epi=epi)

    if epilogue is not None:
        return out
    if return_demod:
        return out, dv
    if demodulate:
        out = out * dv[:, None, None, :]
    return out


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
    packed_in: bool = False,
    packed_out: bool = False,
    return_demod: bool = False,
    epilogue=None,
) -> jnp.ndarray:
    """Style-modulated conv. x: (B,H,W,Cin), w: (kh,kw,Cin,Cout), style: (B,Cin).

    `style` is the already-affine-mapped modulation vector (the reference's
    `modulation(style)`); scale = 1/sqrt(fan_in) is applied internally.

    packed_in/packed_out select the space-to-depth layout (ops/packed.py)
    for the input/output tensors; parameters are identical in either mode.

    epilogue: optional dict(noise=, bias=, act=, post_add=) — the styled
    epilogue (demod scale folded in) applied after the conv, FUSED into
    the conv's Pallas store on the dense stride-1 lowerings; the return
    value is then the fully activated tensor (return_demod ignored).
    """
    if packed_in or packed_out:
        return _modulated_conv2d_packed(
            x, w, style, demodulate=demodulate, up=up, down=down,
            dilation=dilation, blur_kernel=blur_kernel, eps=eps,
            packed_in=packed_in, packed_out=packed_out,
            return_demod=return_demod, epilogue=epilogue)
    kh, kw, c_in, c_out = w.shape
    assert kh == kw, "square kernels only"
    k = kh
    fan_in = c_in * k * k
    scale = 1.0 / (fan_in ** 0.5)

    if demodulate:
        d = demod_coeffs(w, style, scale, eps)  # (B, c_out)
    dv = d if demodulate else None

    xs = x * style[:, None, None, :]
    ws = scale * w

    if up:
        if (dilation == 1 and isinstance(blur_kernel, (tuple, list))
                and c_out < 128):
            # Lane-starved output (c_out < 128 pads the lane dim): subpixel
            # composed conv emitting 4*c_out phase channels + Pallas d2s.
            # At c_out >= 128 the lhs-dilated conv runs at full MXU util
            # and the dense phase assembly's ~1.8x tap overcount loses
            # (measured: restore 90 -> 102 ms when applied everywhere);
            # the models' own c_out < 128 resolutions use the packed
            # free-output path instead, so this is a fallback for
            # non-packed configs (e.g. packed_min_res=0).
            from vspbfr_tpu.ops.packed import up_conv_blur_unpacked
            out = up_conv_blur_unpacked(xs, ws, tuple(blur_kernel))
        else:
            out = conv_transpose2d(xs, ws, stride=2, padding=0,
                                   dilation=dilation)
            if blur_kernel is not None:
                factor = 2
                klen = len(blur_kernel) if isinstance(blur_kernel, (tuple, list)) else blur_kernel.shape[0]
                p = (klen - factor) - (k - 1) * dilation
                pad0 = (p + 1) // 2 + factor - 1
                pad1 = p // 2 + 1
                out = _blur(out, blur_kernel, pad=(pad0, pad1),
                            upsample_factor=factor)
    elif down:
        factor = 2
        klen = len(blur_kernel) if isinstance(blur_kernel, (tuple, list)) else blur_kernel.shape[0]
        p = (klen - factor) + (k - 1)
        pad0 = (p + 1) // 2
        pad1 = p // 2
        if dilation == 1 and isinstance(blur_kernel, (tuple, list)):
            out = fused_blur_strided_conv(xs, ws, tuple(blur_kernel),
                                          (pad0, pad1), stride=2)
        else:
            xs = _blur(xs, blur_kernel, pad=(pad0, pad1))
            out = conv2d(xs, ws, stride=2, padding=0, dilation=dilation)
    else:
        padding = ((k - 1) * dilation) // 2
        if k == 1 and c_out < 128:
            # lane-starved 1x1 (ToRGB, c_out=3): fold the style into a
            # per-batch weight (B,Ci,Co is tiny) instead of materializing
            # x*style — a full-activation HBM round trip (measured 0.2 ms
            # per 256-res ToRGB in the XProf trace)
            wb = style[:, :, None].astype(x.dtype) * ws[0, 0].astype(x.dtype)
            out = jnp.einsum("bhwc,bco->bhwo", x, wb)
        elif dilation == 1:
            # fold the style multiply into the Pallas conv input stripe
            # (and the epilogue into its store, when given)
            from vspbfr_tpu.ops.pallas_conv import (
                conv2d_dense,
                conv2d_dense_epilogue,
            )
            pads = ((padding, padding), (padding, padding))
            if epilogue is not None:
                return conv2d_dense_epilogue(x, ws, pads, in_scale=style,
                                             out_scale=dv, **epilogue)
            out = conv2d_dense(x, ws, pads, in_scale=style)
        else:
            out = conv2d(xs, ws, stride=1, padding=padding, dilation=dilation)

    if epilogue is not None:
        from vspbfr_tpu.ops.packed import _epi_after
        return _epi_after(out, dict(epilogue, out_scale=dv))
    if return_demod:
        return out, (d if demodulate else None)
    if demodulate:
        out = out * d[:, None, None, :]
    return out
