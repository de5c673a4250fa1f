"""Golden tests: packed-layout ops == space_to_depth(unpacked op).

The packed forms are exact reformulations (same sums, reassociated), so
tolerances are tight f32 ones.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vspbfr_tpu.ops.modulated_conv import (
    conv2d,
    conv_transpose2d,
    fused_blur_strided_conv,
)
from vspbfr_tpu.ops.packed import (
    blur_down_conv_packed,
    conv1x1_packed,
    conv2d_packed,
    depth_to_space,
    pack_vector,
    space_to_depth,
    up_conv_blur_packed,
    upsample2d_packed,
)
from vspbfr_tpu.ops.upfirdn2d import blur as fir_blur, upsample2d

TAPS = (1, 3, 3, 1)


def rand(key, *shape):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32)


def test_space_to_depth_semantics():
    x = rand(0, 2, 6, 8, 3)
    p = space_to_depth(x)
    assert p.shape == (2, 3, 4, 12)
    for a in range(2):
        for b in range(2):
            ph = p[..., (2 * a + b) * 3:(2 * a + b + 1) * 3]
            np.testing.assert_array_equal(ph, x[:, a::2, b::2, :])
    np.testing.assert_array_equal(depth_to_space(p), x)


def test_pack_vector_matches_layout():
    x = rand(1, 1, 4, 4, 5)
    v = rand(2, 5)
    ref = space_to_depth(x * v)
    np.testing.assert_allclose(space_to_depth(x) * pack_vector(v), ref,
                               rtol=1e-6)


@pytest.mark.parametrize("k", [1, 3])
def test_conv2d_packed_stride1(k):
    x = rand(3, 2, 16, 16, 5)
    w = rand(4, k, k, 5, 7) * 0.2
    ref = space_to_depth(conv2d(x, w, padding=(k - 1) // 2))
    out = conv2d_packed(space_to_depth(x), w)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dil", [2, 4, 8])
@pytest.mark.parametrize("grouped", [True, False])
def test_conv2d_packed_even_dilation(dil, grouped):
    x = rand(5, 2, 32, 32, 5)
    w = rand(6, 3, 3, 5, 7) * 0.2
    pad = ((3 - 1) * dil) // 2
    ref = space_to_depth(conv2d(x, w, padding=pad, dilation=dil))
    out = conv2d_packed(space_to_depth(x), w, dilation=dil,
                        groups_hint=grouped)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_conv2d_packed_odd_dilation():
    x = rand(15, 2, 32, 32, 5)
    w = rand(16, 3, 3, 5, 7) * 0.2
    dil = 3
    pad = ((3 - 1) * dil) // 2
    ref = space_to_depth(conv2d(x, w, padding=pad, dilation=dil))
    out = conv2d_packed(space_to_depth(x), w, dilation=dil)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_conv1x1_packed():
    x = rand(7, 2, 8, 8, 5)
    w = rand(8, 1, 1, 5, 3) * 0.5
    ref = space_to_depth(conv2d(x, w, padding=0))
    out = conv1x1_packed(space_to_depth(x), w)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def _up_blur_ref(x, w, taps):
    """The modulated_conv2d up branch (without style/demod):
    conv_transpose stride 2 + reference Blur pads."""
    k = w.shape[0]
    lk = len(taps)
    factor = 2
    out = conv_transpose2d(x, w, stride=2, padding=0)
    p = (lk - factor) - (k - 1)
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2 + 1
    return fir_blur(out, taps, pad=(pad0, pad1), upsample_factor=factor)


def test_up_conv_blur_packed_from_unpacked():
    x = rand(9, 2, 16, 16, 5)
    w = rand(10, 3, 3, 5, 7) * 0.2
    ref = space_to_depth(_up_blur_ref(x, w, TAPS))
    out = up_conv_blur_packed(x, w, TAPS, packed_in=False)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_up_conv_blur_packed_from_packed():
    x = rand(11, 2, 16, 16, 5)
    w = rand(12, 3, 3, 5, 7) * 0.2
    ref = space_to_depth(_up_blur_ref(x, w, TAPS))
    out = up_conv_blur_packed(space_to_depth(x), w, TAPS, packed_in=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_blur_down_conv_packed():
    x = rand(13, 2, 32, 32, 5)
    w = rand(14, 3, 3, 5, 7) * 0.2
    k, lk, factor = 3, len(TAPS), 2
    p = (lk - factor) + (k - 1)
    pads = ((p + 1) // 2, p // 2)
    ref = fused_blur_strided_conv(x, w, TAPS, pads, stride=2)
    out = blur_down_conv_packed(space_to_depth(x), w, TAPS)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_blur_down_conv_packed_packed():
    """packed in AND packed out (the encoder downsample with
    packed_min_res below the top resolution)."""
    from vspbfr_tpu.ops.packed import blur_down_conv_packed_packed

    x = rand(15, 2, 32, 32, 5)
    w = rand(16, 3, 3, 5, 7) * 0.2
    k, lk, factor = 3, len(TAPS), 2
    p = (lk - factor) + (k - 1)
    pads = ((p + 1) // 2, p // 2)
    ref = space_to_depth(fused_blur_strided_conv(x, w, TAPS, pads, stride=2))
    out = blur_down_conv_packed_packed(space_to_depth(x), w, TAPS)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    # in_scale folds a per-sample channel scale into the packed input
    s = rand(17, 2, 5) * 0.3 + 1.0
    ref2 = space_to_depth(fused_blur_strided_conv(
        x * s[:, None, None, :], w, TAPS, pads, stride=2))
    out2 = blur_down_conv_packed_packed(space_to_depth(x), w, TAPS,
                                        in_scale=pack_vector(s))
    np.testing.assert_allclose(out2, ref2, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("packed_in", [False, True])
def test_upsample2d_packed(packed_in):
    x = rand(17, 2, 16, 16, 3)
    ref = space_to_depth(upsample2d(x, TAPS))
    xin = space_to_depth(x) if packed_in else x
    out = upsample2d_packed(xin, TAPS, packed_in=packed_in)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_modulated_conv_d12_merged_matches_separate(rng):
    """d1+d2 merged packed conv == the two separate branch convs."""
    from vspbfr_tpu.ops.modulated_conv import (modulated_conv2d,
                                               modulated_conv2d_d12_packed)

    b, hg, c, cb = 2, 8, 8, 2
    x = jnp.asarray(rng.standard_normal((b, hg, hg, 4 * c)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((3, 3, c, cb)).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((3, 3, c, cb)).astype(np.float32))
    sty = jnp.asarray((rng.standard_normal((b, c)) * 0.2 + 1)
                      .astype(np.float32))
    for demod in (True, False):
        merged = modulated_conv2d_d12_packed(x, w1, w2, sty, demodulate=demod)
        o1 = modulated_conv2d(x, w1, sty, dilation=1, demodulate=demod,
                              packed_in=True, packed_out=True)
        o2 = modulated_conv2d(x, w2, sty, dilation=2, demodulate=demod,
                              packed_in=True, packed_out=True)
        ref = jnp.concatenate([o1, o2], axis=-1)
        np.testing.assert_allclose(np.asarray(merged), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
