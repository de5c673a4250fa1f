"""StyleGAN2 / SMART building blocks (flax, NHWC).

Re-designs of the blocks in `models/RestoreNet.py:24-787` and
`e4e/models/stylegan2/model.py`. Parameter layouts are JAX-native
(linear: (in, out); conv: HWIO); the torch converter transposes.

Equalized-lr convention (matches `EqualLinear`/`EqualConv2d`,
`models/RestoreNet.py:104-176`): parameters are stored unscaled — weights
drawn from N(0, 1) (divided by lr_mul for linears), and the scale
1/sqrt(fan_in) (times lr_mul) is applied at use time. Converters must keep
stored params unscaled (SURVEY.md §7).

Stochasticity is threaded through the flax 'noise' RNG collection when a
layer's `noise=` argument is None (mirrors randomize_noise=True).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vspbfr_tpu.ops import (
    blur as _blur,
    conv2d,
    fused_leaky_relu,
    make_resample_kernel,
    modulated_conv2d,
    upfirdn2d,
    upsample2d,
)

BLUR_KERNEL_DEFAULT = (1, 3, 3, 1)


def _branch_major_perm(features: int, n_branches: int) -> tuple:
    """Packed-channel permutation mapping the fusion conv's expected
    phase-major (ph, br, cb) layout onto the branch-major (br, ph, cb)
    concat the SMART/LargeConv branches produce: perm[j] = packed channel
    held at data channel j."""
    cb = features // n_branches
    perm = np.empty(4 * features, np.int32)
    for br in range(n_branches):
        for ph in range(4):
            for c in range(cb):
                j = br * 4 * cb + ph * cb + c
                perm[j] = ph * features + br * cb + c
    return tuple(int(v) for v in perm)


def pixel_norm(x: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    """x * rsqrt(mean(x^2, channel)) (`models/RestoreNet.py:24-29`).

    The reference normalizes over NCHW dim 1; with channels-last data the
    equivalent axis is -1. Callers with (B, L, D) latents normalize over D
    only when the torch code's dim-1 is D (2D inputs); pass axis explicitly
    for 3D latents where torch dim 1 is the layer axis.
    """
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


def _normal_init(stddev: float = 1.0):
    return nn.initializers.normal(stddev=stddev)


class EqualLinear(nn.Module):
    """Equalized-lr linear, optional fused-lrelu activation
    (`models/RestoreNet.py:142-176`)."""

    features: int
    use_bias: bool = True
    bias_init: float = 0.0
    lr_mul: float = 1.0
    activation: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        w = self.param("weight", _normal_init(1.0 / self.lr_mul),
                       (in_dim, self.features))
        scale = (1.0 / math.sqrt(in_dim)) * self.lr_mul
        out = x @ (w * scale)
        b = None
        if self.use_bias:
            b = self.param("bias", nn.initializers.constant(self.bias_init),
                           (self.features,)) * self.lr_mul
        if self.activation:
            return fused_leaky_relu(out, b)
        if b is not None:
            out = out + b
        return out


class EqualConv2d(nn.Module):
    """Equalized-lr conv (`models/RestoreNet.py:104-139`; dilated variant
    `:683-722`)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    # when set, a separable FIR pre-blur with these taps/pads is composed
    # into the conv kernel (one strided conv instead of blur + conv)
    pre_blur_taps: tuple | None = None
    pre_blur_pad: tuple = (0, 0)
    packed: bool = False  # space-to-depth layout in AND out (stride-1 only)
    # packed-input-channel permutation folded into the kernel (the SMART /
    # LargeConv branch concat is consumed in branch-major order directly)
    packed_in_perm: tuple | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, epi=None) -> jnp.ndarray:
        """epi: optional styled epilogue dict (noise/bias/act/post_add)
        fused into the conv store where the lowering ends in a dense
        Pallas conv (the caller owns the bias in that case)."""
        perm = (np.asarray(self.packed_in_perm, np.int32)
                if self.packed_in_perm is not None else None)
        c_in = x.shape[-1] // (4 if self.packed else 1)
        w = self.param("weight", _normal_init(),
                       (self.kernel_size, self.kernel_size, c_in, self.features))
        scale = 1.0 / math.sqrt(c_in * self.kernel_size ** 2)
        if self.packed:
            from vspbfr_tpu.ops import packed as pk
            assert self.stride == 1 and self.pre_blur_taps is None
            assert not (self.use_bias and epi is not None)
            if self.kernel_size == 1:
                out = pk.conv1x1_packed(x, w * scale, in_ch_perm=perm,
                                        epi=epi)
            else:
                hint = self.dilation >= 4 and x.shape[-1] >= 512
                out = pk.conv2d_packed(x, w * scale, dilation=self.dilation,
                                       groups_hint=hint, in_ch_perm=perm,
                                       epi=epi)
            if self.use_bias:
                b = self.param("bias", nn.initializers.zeros, (self.features,))
                out = out + pk.pack_vector(b).reshape(1, 1, 1, -1)
            return out
        if self.pre_blur_taps is not None:
            from vspbfr_tpu.ops.modulated_conv import fused_blur_strided_conv
            out = fused_blur_strided_conv(x, w * scale, self.pre_blur_taps,
                                          self.pre_blur_pad,
                                          stride=self.stride)
        elif (epi is not None and self.stride == 1 and self.dilation == 1
              and not self.use_bias):
            from vspbfr_tpu.ops.pallas_conv import conv2d_dense_epilogue
            p = self.padding
            return conv2d_dense_epilogue(x, w * scale, ((p, p), (p, p)),
                                         **epi)
        else:
            out = conv2d(x, w * scale, stride=self.stride,
                         padding=self.padding, dilation=self.dilation)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + b.reshape(1, 1, 1, -1)
        if epi is not None:
            from vspbfr_tpu.ops.packed import _epi_after
            out = _epi_after(out, epi)
        return out


class FusedLeakyReLU(nn.Module):
    """Per-channel learnable bias + lrelu*sqrt(2) (`op/fused_act.py:199-213`).

    return_bias=True returns the (packed) bias vector instead of applying —
    used by the fused conv-epilogue path (same params either way)."""

    features: int
    use_bias: bool = True
    packed: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray | None,
                 return_bias: bool = False):
        b = (self.param("bias", nn.initializers.zeros, (self.features,))
             if self.use_bias else None)
        if self.packed and b is not None:
            from vspbfr_tpu.ops.packed import pack_vector
            b = pack_vector(b)
        if return_bias:
            return b
        return fused_leaky_relu(x, b)


class NoiseInjection(nn.Module):
    """image + weight * noise, scalar learnable weight
    (`models/RestoreNet.py:557-569`).

    return_parts=True returns (weight, noise) without applying (noise drawn
    from the module's own 'noise' rng stream when not given) — consumed by
    the fused conv-epilogue path."""

    packed: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, noise: jnp.ndarray | None = None,
                 return_parts: bool = False):
        w = self.param("weight", nn.initializers.zeros, (1,))
        if not self.packed:
            if noise is None:
                b, h, wd, _ = x.shape
                # drawn in f32 then cast: a bf16 compute_dtype run sees the
                # SAME random stream as the f32 pipeline (bf16-native normal
                # sampling produces different values, not just lower
                # precision)
                noise = jax.random.normal(self.make_rng("noise"),
                                          (b, h, wd, 1)).astype(x.dtype)
            if return_parts:
                return w, noise
            return x + w * noise
        b, h, wd, c4 = x.shape
        if noise is None:
            # drawn directly in the packed layout: same iid-normal semantics
            # as the unpacked draw, but avoids a C=1 space_to_depth transpose
            # (lane-starved, measured several ms at 1024^2). The stream
            # differs from the unpacked layout's; cross-layout parity tests
            # pass explicit noise.
            noise = jax.random.normal(self.make_rng("noise"),
                                      (b, h, wd, 4)).astype(x.dtype)
        else:
            from vspbfr_tpu.ops.packed import space_to_depth
            noise = space_to_depth(noise)  # (B, 2h, 2w, 1) -> (B, h, w, 4)
        if return_parts:
            return w, noise
        # phase -> channel-group expansion as a tiny matmul: XLA's lane-dim
        # jnp.repeat lowers pathologically (measured 6.6 ms alone at
        # (4,512,512,4->128) on v5e vs ~1 ms for the dot form)
        expand = jnp.asarray(
            np.kron(np.eye(4, dtype=np.float32), np.ones((1, c4 // 4),
                                                         np.float32)),
            x.dtype)
        return x + w * (noise @ expand)


class Blur(nn.Module):
    """FIR blur with fixed pad (`models/RestoreNet.py:84-101`)."""

    kernel: Sequence[int] = BLUR_KERNEL_DEFAULT
    pad: tuple[int, int] = (0, 0)
    upsample_factor: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return _blur(x, tuple(self.kernel), pad=self.pad,
                     upsample_factor=self.upsample_factor)


class ModulatedConv2d(nn.Module):
    """Style-modulated conv with internal affine modulation
    (`models/RestoreNet.py:421-555`). Supports up/down/dilation."""

    features: int
    kernel_size: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    dilation: int = 1
    blur_kernel: Sequence[int] = BLUR_KERNEL_DEFAULT
    external_modulation: bool = False  # Dilated_ModulatedConv2d: style comes pre-modulated
    packed_in: bool = False
    packed_out: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, style: jnp.ndarray,
                 return_demod: bool = False, return_weight: bool = False,
                 epilogue=None):
        c_in = x.shape[-1] // (4 if self.packed_in else 1)
        if not self.external_modulation:
            style = EqualLinear(c_in, bias_init=1.0, name="modulation")(style)
        w = self.param("weight", _normal_init(),
                       (self.kernel_size, self.kernel_size, c_in, self.features))
        if return_weight:
            # param holder mode (fused multi-branch paths own the compute)
            return w
        return modulated_conv2d(
            x, w, style,
            demodulate=self.demodulate,
            up=self.upsample,
            down=self.downsample,
            dilation=self.dilation,
            blur_kernel=tuple(self.blur_kernel),
            packed_in=self.packed_in,
            packed_out=self.packed_out,
            return_demod=return_demod,
            epilogue=epilogue,
        )


def _styled_out_shape(xshape, features: int, up: bool, down: bool,
                      pk_in: bool, pk_out: bool) -> tuple:
    """Static output shape of a StyledConv given its input shape and
    layout flags (packed tensors live on the half grid with 4C channels)."""
    b, h = xshape[0], xshape[1]
    res = 2 * h if pk_in else h
    if up:
        res *= 2
    if down:
        res //= 2
    grid = res // 2 if pk_out else res
    c = 4 * features if pk_out else features
    return (b, grid, grid, c)


class StyledConv(nn.Module):
    """ModulatedConv2d + noise injection + FusedLeakyReLU
    (`models/RestoreNet.py:571-643`, covers both StyledConv and
    StyledConv_down via the downsample flag)."""

    features: int
    kernel_size: int = 3
    upsample: bool = False
    downsample: bool = False
    demodulate: bool = True
    blur_kernel: Sequence[int] = BLUR_KERNEL_DEFAULT
    packed_in: bool = False
    packed_out: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, style: jnp.ndarray,
                 noise: jnp.ndarray | None = None,
                 post_add=()) -> jnp.ndarray:
        """post_add: tensors of the output shape added AFTER the lrelu
        (the RestoreNet decoder's skip fusion rides the same fused store,
        `models/RestoreNet.py:1029-1035`)."""
        # the epilogue fuses into the conv's store, so the noise draw needs
        # the OUTPUT shape before the conv runs — static layer geometry,
        # probed with a zero-cost placeholder (only shape/dtype are read)
        out_shape = _styled_out_shape(x.shape, self.features, self.upsample,
                                      self.downsample, self.packed_in,
                                      self.packed_out)
        probe = jnp.zeros(out_shape, x.dtype)
        w_n, nz = NoiseInjection(packed=self.packed_out,
                                 name="noise")(probe, noise,
                                               return_parts=True)
        bias = FusedLeakyReLU(self.features, packed=self.packed_out,
                              name="activate")(None, return_bias=True)
        # demod-scale + noise + bias + lrelu fused into the conv store
        return ModulatedConv2d(
            self.features, self.kernel_size,
            demodulate=self.demodulate,
            upsample=self.upsample,
            downsample=self.downsample,
            blur_kernel=self.blur_kernel,
            packed_in=self.packed_in,
            packed_out=self.packed_out,
            name="conv",
        )(x, style, epilogue=dict(noise=w_n * nz, bias=bias, act=True,
                                  post_add=tuple(post_add)))


class ToRGB(nn.Module):
    """1x1 mod-conv (no demod) + bias, with optional upsampled skip
    (`models/RestoreNet.py:647-666`)."""

    upsample: bool = True
    blur_kernel: Sequence[int] = BLUR_KERNEL_DEFAULT
    out_features: int = 3
    packed: bool = False       # feature input AND rgb output layout
    skip_packed: bool = False  # layout of the incoming half-res skip

    @nn.compact
    def __call__(self, x: jnp.ndarray, style: jnp.ndarray,
                 skip: jnp.ndarray | None = None) -> jnp.ndarray:
        out = ModulatedConv2d(self.out_features, 1, demodulate=False,
                              packed_in=self.packed, packed_out=self.packed,
                              name="conv")(x, style)
        b = self.param("bias", nn.initializers.zeros, (self.out_features,))
        if self.packed:
            from vspbfr_tpu.ops.packed import pack_vector, upsample2d_packed
            out = out + pack_vector(b).reshape(1, 1, 1, -1)
            if skip is not None:
                out = out + upsample2d_packed(skip, tuple(self.blur_kernel),
                                              packed_in=self.skip_packed)
            return out
        out = out + b.reshape(1, 1, 1, -1)
        if skip is not None:
            out = out + upsample2d(skip, tuple(self.blur_kernel))
        return out


class ConvLayer(nn.Module):
    """[Blur+stride2] EqualConv2d [+ FusedLeakyReLU]
    (`models/RestoreNet.py:1130-1172`)."""

    features: int
    kernel_size: int
    downsample: bool = False
    blur_kernel: Sequence[int] = BLUR_KERNEL_DEFAULT
    use_bias: bool = True
    activate: bool = True
    packed: bool = False  # stride-1 only: packed in and out
    packed_in_perm: tuple | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, epi_extra=None) -> jnp.ndarray:
        """epi_extra: optional dict of extra epilogue pieces (noise,
        post_add) merged into the activation epilogue — lets a SMART tail
        ride the fusion conv's store (requires activate=True)."""
        k = self.kernel_size
        epi = None
        if self.activate:
            bias = FusedLeakyReLU(self.features, use_bias=self.use_bias,
                                  packed=self.packed,
                                  name="activate")(None, return_bias=True)
            epi = dict(noise=None, bias=bias, act=True, post_add=())
            if epi_extra:
                epi.update(epi_extra)
        else:
            assert not epi_extra
        if self.packed:
            assert not self.downsample
            return EqualConv2d(self.features, k, stride=1, padding=k // 2,
                               use_bias=self.use_bias and not self.activate,
                               packed=True,
                               packed_in_perm=self.packed_in_perm,
                               name="conv")(x, epi=epi)
        if self.downsample:
            # blur + stride-2 conv fused into one strided conv with the
            # composed kernel (removes the depthwise FIR pass)
            factor = 2
            p = (len(self.blur_kernel) - factor) + (k - 1)
            out = EqualConv2d(self.features, k, stride=2, padding=0,
                              use_bias=self.use_bias and not self.activate,
                              pre_blur_taps=tuple(self.blur_kernel),
                              pre_blur_pad=((p + 1) // 2, p // 2),
                              name="conv")(x)
            if self.activate:
                from vspbfr_tpu.ops.packed import _epi_after
                out = _epi_after(out, epi)
            return out
        return EqualConv2d(self.features, k, stride=1, padding=k // 2,
                           use_bias=self.use_bias and not self.activate,
                           name="conv")(x, epi=epi)


class ResBlock(nn.Module):
    """StyleGAN2 D residual block (`models/RestoreNet.py:1175-1200`)."""

    features: int
    blur_kernel: Sequence[int] = BLUR_KERNEL_DEFAULT

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        out = ConvLayer(c_in, 3, name="conv1")(x)
        out = ConvLayer(self.features, 3, downsample=True, name="conv2")(out)
        skip = ConvLayer(self.features, 1, downsample=True, activate=False,
                         use_bias=False, name="skip")(x)
        return (out + skip) / math.sqrt(2)


class SMARTLayer(nn.Module):
    """Style-Modulated AggRegation Transformation: one shared style affine
    drives 4 parallel dilated modulated convs (rates 1/2/4/8, each out/4
    channels) -> concat -> 3x3 fusion -> noise -> fused lrelu
    (`models/RestoreNet.py:179-268`)."""

    features: int
    kernel_size: int = 3
    upsample: bool = False
    demodulate: bool = True
    rates: Sequence[int] = (1, 2, 4, 8)
    activate: bool = True
    blur_kernel: Sequence[int] = BLUR_KERNEL_DEFAULT
    packed: bool = False  # packed in and out (stride-1 SMART only)

    @nn.compact
    def __call__(self, x: jnp.ndarray, style: jnp.ndarray,
                 noise: jnp.ndarray | None = None,
                 return_intermediates: bool = False):
        """return_intermediates=True additionally returns the per-dilation
        branch outputs + the final tensor (`forward_vis`,
        `models/RestoreNet.py:246-268`)."""
        if self.packed:
            assert not self.upsample
        c_in = x.shape[-1] // (4 if self.packed else 1)
        mod = EqualLinear(c_in, bias_init=1.0, name="modulation")(style)
        branch = self.features // len(self.rates)

        def branch_conv(i, rate, return_weight=False):
            return ModulatedConv2d(
                branch, self.kernel_size,
                demodulate=self.demodulate,
                upsample=self.upsample,
                dilation=rate,
                blur_kernel=self.blur_kernel,
                external_modulation=True,
                packed_in=self.packed,
                packed_out=self.packed,
                name=f"dilated_{i}",
            )(x, mod, return_weight=return_weight)

        merge_d12 = (self.packed and not self.upsample
                     and self.kernel_size == 3
                     and tuple(self.rates)[:2] == (1, 2)
                     and not return_intermediates)
        merge_all = (not self.packed and not self.upsample
                     and self.kernel_size == 3
                     and not return_intermediates)
        if merge_d12:
            # d=1 and d=2 share the packed 3x3 footprint: one conv with
            # 2x the output lanes (Pallas-eligible at Cb = C/4)
            from vspbfr_tpu.ops.modulated_conv import \
                modulated_conv2d_d12_packed
            w1 = branch_conv(0, 1, return_weight=True)
            w2 = branch_conv(1, 2, return_weight=True)
            out12 = modulated_conv2d_d12_packed(x, w1, w2, mod,
                                                demodulate=self.demodulate)
            outs = [out12]
            if tuple(self.rates)[2:] == (4, 8):
                # the even-dilation pair rides ONE Pallas multi-dilation
                # kernel (half-grid grouped taps-in-N; scripts/exp_d48.py:
                # 2.07x bf16 / 1.81x f32 over the block-diag dense convs)
                from vspbfr_tpu.ops.modulated_conv import \
                    modulated_conv2d_d48_packed
                w4 = branch_conv(2, 4, return_weight=True)
                w8 = branch_conv(3, 8, return_weight=True)
                outs.append(modulated_conv2d_d48_packed(
                    x, w4, w8, mod, demodulate=self.demodulate))
            else:
                outs += [branch_conv(i, r)
                         for i, r in enumerate(self.rates) if i >= 2]
        elif merge_all:
            # unpacked stride-1 SMART: all 4 branches in one multi-dilation
            # kernel (1.97x at the 256-res shapes, scripts/exp_d48.py)
            from vspbfr_tpu.ops.modulated_conv import modulated_conv2d_multi
            ws = [branch_conv(i, r, return_weight=True)
                  for i, r in enumerate(self.rates)]
            outs = [modulated_conv2d_multi(x, ws, tuple(self.rates), mod,
                                           demodulate=self.demodulate)]
        else:
            outs = [branch_conv(i, rate)
                    for i, rate in enumerate(self.rates)]
        out = jnp.concatenate(outs, axis=-1)
        # packed branch outputs concat branch-major (br, ph, cb); instead of
        # reshuffling the tensor to phase-major, fold the permutation into
        # the fusion conv's input channels (zero data movement)
        perm = (_branch_major_perm(self.features, len(self.rates))
                if self.packed else None)
        # the whole tail — fusion-conv bias+lrelu, then noise + (optional)
        # bias+lrelu (`models/RestoreNet.py:226-238`) — rides the fusion
        # conv's fused store as a two-stage epilogue; the concat has the
        # fusion output's exact shape, so it doubles as the noise probe
        w_n, nz = NoiseInjection(packed=self.packed,
                                 name="noise")(out, noise, return_parts=True)
        bias2 = (FusedLeakyReLU(self.features, packed=self.packed,
                                name="activate")(None, return_bias=True)
                 if self.activate else None)
        out = ConvLayer(self.features, 3, packed=self.packed,
                        packed_in_perm=perm, name="fusion")(
            out, epi_extra=dict(noise2=w_n * nz, bias2=bias2,
                                act2=self.activate))
        if return_intermediates:
            return out, outs + [out]
        return out


class LargeConvLayer(nn.Module):
    """Unmodulated multi-dilation aggregation: 4 dilated equal-convs ->
    concat -> 1x1 fusion -> fused lrelu, optional blur+stride-2
    (`models/RestoreNet.py:725-787`)."""

    features: int
    kernel_size: int
    downsample: bool = False
    rates: Sequence[int] = (1, 2, 4, 8)
    use_bias: bool = True
    activate: bool = True
    blur_kernel: Sequence[int] = BLUR_KERNEL_DEFAULT
    packed: bool = False  # packed in and out (stride-1 only)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        if self.downsample:
            assert not self.packed
            factor = 2
            p = (len(self.blur_kernel) - factor) + (k - 1)
            x = Blur(self.blur_kernel, pad=((p + 1) // 2, p // 2), name="blur")(x)
            stride = 2
        else:
            stride = 1
        branch = self.features // len(self.rates)
        outs = []
        for i, rate in enumerate(self.rates):
            pad = ((k - 1) * rate - stride) // 2 if self.downsample else ((k - 1) * rate) // 2
            outs.append(
                EqualConv2d(branch, k, stride=stride, padding=pad, dilation=rate,
                            use_bias=self.use_bias and not self.activate,
                            packed=self.packed,
                            name=f"dilated_{i}")(x)
            )
        out = jnp.concatenate(outs, axis=-1)
        perm = (_branch_major_perm(self.features, len(self.rates))
                if self.packed else None)
        out = ConvLayer(self.features, 1, packed=self.packed,
                        packed_in_perm=perm, name="fusion")(out)
        if self.activate:
            out = FusedLeakyReLU(self.features, use_bias=self.use_bias,
                                 packed=self.packed, name="activate")(out)
        return out


class StyleMLP(nn.Module):
    """PixelNorm + n_mlp equalized linears with fused lrelu
    (`models/RestoreNet.py:837-846`, `e4e/models/stylegan2/model.py:383-392`)."""

    style_dim: int = 512
    n_mlp: int = 8
    lr_mul: float = 0.01

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        x = pixel_norm(z)
        for i in range(self.n_mlp):
            x = EqualLinear(self.style_dim, lr_mul=self.lr_mul, activation=True,
                            name=f"fc{i}")(x)
        return x


def minibatch_stddev(x: jnp.ndarray, group_size: int = 4,
                     num_new_features: int = 1, eps: float = 1e-8) -> jnp.ndarray:
    """Append the cross-sample stddev statistic channel
    (`models/RestoreNet.py:1243-1252`)."""
    b, h, w, c = x.shape
    g = min(b, group_size)
    y = x.reshape(g, -1, h, w, num_new_features, c // num_new_features)
    y = y - jnp.mean(y, axis=0, keepdims=True)
    y = jnp.sqrt(jnp.mean(jnp.square(y), axis=0) + eps)   # biased var, as torch var(unbiased=False)
    y = jnp.mean(y, axis=(1, 2, 4), keepdims=True)        # mean over H,W,C-groups
    y = jnp.squeeze(y, axis=4)                            # (b/g, 1, 1, F)
    y = jnp.tile(y, (g, h, w, 1))
    return jnp.concatenate([x, y], axis=-1)


def truncate_styles(styles: jnp.ndarray, truncation: float,
                    truncation_latent: jnp.ndarray) -> jnp.ndarray:
    """w <- t_lat + trunc * (w - t_lat) (`e4e/models/stylegan2/model.py:498-506`)."""
    return truncation_latent + truncation * (styles - truncation_latent)


def styles_to_latent(styles: jnp.ndarray, n_latent: int,
                     inject_index: jnp.ndarray | int | None) -> jnp.ndarray:
    """Broadcast 1-2 style vectors into a (B, n_latent, D) latent with style
    mixing (`e4e/models/stylegan2/model.py:487-523`).

    styles: (S, B, D) with S in {1, 2}. For S=2, rows < inject_index take
    styles[0], the rest styles[1]; inject_index may be traced (sampled on the
    host per step, `random.randint(1, n_latent-1)`).
    """
    if styles.shape[0] == 1:
        return jnp.repeat(styles[0][:, None, :], n_latent, axis=1)
    if inject_index is None:
        inject_index = n_latent // 2
    idx = jnp.arange(n_latent)[None, :, None]
    lat0 = jnp.repeat(styles[0][:, None, :], n_latent, axis=1)
    lat1 = jnp.repeat(styles[1][:, None, :], n_latent, axis=1)
    return jnp.where(idx < inject_index, lat0, lat1)
