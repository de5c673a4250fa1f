"""Golden tests for the op layer (reference oracle: numpy ports of
`op/upfirdn2d.py:365-406` and the grouped modulated-conv math of
`models/RestoreNet.py:509-554`)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vspbfr_tpu.ops import (
    blur,
    conv2d,
    conv_transpose2d,
    downsample2d,
    fused_leaky_relu,
    make_resample_kernel,
    modulated_conv2d,
    upfirdn2d,
    upfirdn2d_ref,
    upsample2d,
)
from vspbfr_tpu.ops.fused_act import fused_leaky_relu_pallas


K4 = np.asarray(make_resample_kernel([1, 3, 3, 1]))


@pytest.mark.parametrize(
    "up,down,pad",
    [
        (1, 1, (1, 1)),
        (2, 1, (2, 1)),          # Upsample(factor=2) pads for 4-tap kernel
        (1, 2, (1, 1)),          # Downsample(factor=2)
        (2, 2, (1, 1)),
        (1, 1, (2, 1, 1, 2)),    # asymmetric
        (1, 1, (-1, 2, 2, -1)),  # negative pads (ADA path)
        (2, 1, (-1, -1)),        # negative + upsample
        (1, 1, (0, 0)),
    ],
)
def test_upfirdn2d_matches_reference(rng, up, down, pad):
    x = rng.standard_normal((2, 11, 13, 3)).astype(np.float32)
    out = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(K4), up, down, pad))
    ref = upfirdn2d_ref(x, K4, up, down, pad)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_upfirdn2d_asymmetric_kernel(rng):
    """Non-symmetric kernel exercises the true-convolution flip."""
    k = rng.standard_normal((3, 5)).astype(np.float32)
    x = rng.standard_normal((1, 9, 9, 2)).astype(np.float32)
    out = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), 2, 1, (2, 2)))
    ref = upfirdn2d_ref(x, k, 2, 1, (2, 2))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_up_down_sample_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)).astype(np.float32))
    k = jnp.asarray(K4)
    assert upsample2d(x, k).shape == (2, 32, 32, 4)
    assert downsample2d(x, k).shape == (2, 8, 8, 4)
    assert blur(x, k, pad=(2, 1)).shape == (2, 16, 16, 4)


def test_upfirdn2d_grad_and_double_grad(rng):
    """R1 needs second derivatives through every op on the D path."""
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))
    k = jnp.asarray(K4)

    def f(x):
        return jnp.sum(upfirdn2d(x, k, 1, 2, (1, 1)) ** 2)

    g = jax.grad(f)(x)
    assert g.shape == x.shape
    gg = jax.grad(lambda x: jnp.sum(jax.grad(f)(x) ** 2))(x)
    assert bool(jnp.all(jnp.isfinite(gg)))


def test_fused_leaky_relu(rng):
    x = jnp.asarray(rng.standard_normal((4, 8, 8, 16)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(16).astype(np.float32))
    out = fused_leaky_relu(x, b)
    xb = np.asarray(x) + np.asarray(b).reshape(1, 1, 1, 16)
    ref = np.where(xb >= 0, xb, 0.2 * xb) * math.sqrt(2)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)


def test_fused_leaky_relu_pallas_matches(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 128)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(128).astype(np.float32))
    ref = fused_leaky_relu(x, b)
    out = fused_leaky_relu_pallas(x, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_conv_transpose2d_matches_torch_semantics(rng):
    """Cross-check against torch.nn.functional.conv_transpose2d (CPU)."""
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((2, 6, 6, 3)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 5)).astype(np.float32)  # HWIO
    for dilation in (1, 2):
        out = np.asarray(conv_transpose2d(jnp.asarray(x), jnp.asarray(w),
                                          stride=2, padding=0, dilation=dilation))
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        wt = torch.from_numpy(w.transpose(2, 3, 0, 1))  # (cin, cout, kh, kw)
        ref = torch.nn.functional.conv_transpose2d(
            xt, wt, stride=2, padding=0, dilation=dilation
        ).numpy().transpose(0, 2, 3, 1)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def _grouped_modulated_conv_ref(x, w, style, demodulate, dilation):
    """Oracle: the reference fused/grouped path (`models/RestoreNet.py:509-554`)
    computed in numpy via per-sample conv."""
    b, h, wd, cin = x.shape
    kh, kw, _, cout = w.shape
    scale = 1.0 / math.sqrt(cin * kh * kw)
    outs = []
    pad = ((kh - 1) * dilation) // 2
    for i in range(b):
        wi = scale * w * style[i][None, None, :, None]      # modulated
        if demodulate:
            d = 1.0 / np.sqrt(np.sum(wi ** 2, axis=(0, 1, 2)) + 1e-8)
            wi = wi * d[None, None, None, :]
        o = conv2d(jnp.asarray(x[i: i + 1]), jnp.asarray(wi),
                   padding=pad, dilation=dilation)
        outs.append(np.asarray(o))
    return np.concatenate(outs, 0)


@pytest.mark.parametrize("demodulate", [True, False])
@pytest.mark.parametrize("dilation", [1, 2, 4])
def test_modulated_conv_equals_grouped(rng, demodulate, dilation):
    """Input-scaled formulation == per-sample-weight formulation (SURVEY §7)."""
    x = rng.standard_normal((3, 12, 12, 8)).astype(np.float32)
    w = rng.standard_normal((3, 3, 8, 16)).astype(np.float32)
    style = rng.standard_normal((3, 8)).astype(np.float32) + 1.0
    out = np.asarray(
        modulated_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(style),
                         demodulate=demodulate, dilation=dilation)
    )
    ref = _grouped_modulated_conv_ref(x, w, style, demodulate, dilation)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_modulated_conv_up_down_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    bk = jnp.asarray(K4)
    up = modulated_conv2d(x, w, s, up=True, blur_kernel=bk)
    assert up.shape == (2, 16, 16, 16)
    down = modulated_conv2d(x, w, s, down=True, blur_kernel=bk)
    assert down.shape == (2, 4, 4, 16)


def test_modulated_conv_up_matches_torch_reference(rng):
    """Full upsample path (conv_transpose + blur) vs a torch port of the
    reference non-fused branch (`models/RestoreNet.py:481-508`)."""
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    w = rng.standard_normal((3, 3, 4, 6)).astype(np.float32)
    style = (rng.standard_normal((2, 4)) + 1).astype(np.float32)

    out = np.asarray(
        modulated_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(style),
                         up=True, blur_kernel=jnp.asarray(K4))
    )

    # torch oracle
    cin, cout, k = 4, 6, 3
    scale = 1.0 / math.sqrt(cin * k * k)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1))  # (cout, cin, kh, kw)
    st = torch.from_numpy(style)
    wmod = scale * wt.unsqueeze(0) * st.view(2, 1, cin, 1, 1)
    dcoefs = (wmod.square().sum((2, 3, 4)) + 1e-8).rsqrt()
    xin = xt * st.view(2, cin, 1, 1)
    ot = torch.nn.functional.conv_transpose2d(
        xin, (scale * wt).transpose(0, 1), padding=0, stride=2
    )
    # blur: pad arithmetic from Dilated_ModulatedConv2d upsample branch
    p = (4 - 2) - (k - 1)
    pad0 = (p + 1) // 2 + 2 - 1
    pad1 = p // 2 + 1
    ob = blur(jnp.asarray(ot.numpy().transpose(0, 2, 3, 1)), jnp.asarray(K4),
              pad=(pad0, pad1), upsample_factor=2)
    ref = np.asarray(ob) * dcoefs.numpy()[:, None, None, :]
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("c", [3, 64])
@pytest.mark.parametrize(
    "up,down,gain,pad",
    [(1, 1, 1.0, (2, 1)), (2, 1, 4.0, (2, 1)), (1, 2, 1.0, (1, 1))],
)
def test_upfirdn2d_separable_matches_dense(rng, c, up, down, gain, pad):
    """Both separable forms (matmul for small C, 1D convs otherwise) must
    equal the dense 2D path with kernel gain applied."""
    from vspbfr_tpu.ops.upfirdn2d import upfirdn2d_separable
    taps = (1, 3, 3, 1)
    x = rng.standard_normal((2, 12, 10, c)).astype(np.float32)
    out = np.asarray(upfirdn2d_separable(jnp.asarray(x), taps, up, down, pad,
                                         gain=gain))
    k2d = np.asarray(make_resample_kernel(list(taps))) * gain
    ref = upfirdn2d_ref(x, k2d, up, down, pad)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("pad", [(-3, -3), (0, 0), (1, 0), (-1, 2)])
def test_upfirdn2d_separable_negative_pads(rng, pad):
    """SMART up-blurs at dilation 4/8 produce negative blur pads."""
    from vspbfr_tpu.ops.upfirdn2d import upfirdn2d_separable
    taps = (1, 3, 3, 1)
    x = rng.standard_normal((2, 16, 14, 64)).astype(np.float32)
    out = np.asarray(upfirdn2d_separable(jnp.asarray(x), taps, 1, 1, pad,
                                         gain=4.0))
    ref = upfirdn2d_ref(x, np.asarray(make_resample_kernel(list(taps))) * 4.0,
                        1, 1, pad)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("k", [2, 3, 4, 6])
def test_conv_transpose2d_subpixel_all_kernel_sizes(rng, k):
    """Even kernel sizes exercise the parity-swap in the phase decomposition
    (the fused up-conv-blur composes a 6x6 kernel)."""
    torch = pytest.importorskip("torch")
    from vspbfr_tpu.ops.modulated_conv import _conv_transpose2d_subpixel
    x = rng.standard_normal((1, 5, 5, 2)).astype(np.float32)
    w = rng.standard_normal((k, k, 2, 3)).astype(np.float32)
    out = np.asarray(_conv_transpose2d_subpixel(jnp.asarray(x), jnp.asarray(w)))
    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(w.transpose(2, 3, 0, 1)), stride=2,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_fused_up_conv_blur_matches_two_pass(rng):
    """The composed-kernel fused path == conv_transpose + blur two-pass."""
    from vspbfr_tpu.ops.modulated_conv import (_fused_up_conv_blur,
                                               conv_transpose2d)
    from vspbfr_tpu.ops.upfirdn2d import blur as blur_fn
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 4)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 5)).astype(np.float32))
    taps = (1, 3, 3, 1)
    two = conv_transpose2d(x, w, stride=2, padding=0)
    k2d = np.asarray(make_resample_kernel(list(taps))) * 4.0
    two = blur_fn(two, jnp.asarray(k2d), pad=(1, 1))
    fused = _fused_up_conv_blur(x, w, taps)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(two),
                               rtol=1e-4, atol=1e-5)


def test_fused_blur_strided_conv_matches_two_pass(rng):
    """Down-path fusion: blur + stride-2 conv == one composed strided conv."""
    from vspbfr_tpu.ops.modulated_conv import fused_blur_strided_conv
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 5)).astype(np.float32))
    taps = (1, 3, 3, 1)
    p = (4 - 2) + (3 - 1)
    pad = ((p + 1) // 2, p // 2)
    two = blur(x, taps, pad=pad)
    two = conv2d(two, w, stride=2, padding=0)
    fused = fused_blur_strided_conv(x, w, taps, pad, stride=2)
    assert fused.shape == two.shape
    np.testing.assert_allclose(np.asarray(fused), np.asarray(two),
                               rtol=1e-4, atol=1e-5)


def test_pallas_d2s_interleave(rng):
    """Pallas phase interleave kernel == XLA 6D transpose (interpret mode),
    both directions, and they invert each other."""
    from vspbfr_tpu.ops import pallas_d2s as pd

    inner = 128
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 4 * inner))
                    .astype(np.float32))
    ref = pd._d2s_xla(x, inner)
    got = pd._d2s_pallas(x, inner, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    back_ref = pd._s2d_xla(ref, inner)
    np.testing.assert_array_equal(np.asarray(back_ref), np.asarray(x))
    back = pd._s2d_pallas(ref, inner, interpret=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_d2s_vjp_is_inverse_permutation(rng):
    """grad through interleave_d2s == the inverse scatter (permutation op)."""
    from vspbfr_tpu.ops.pallas_d2s import gather_s2d, interleave_d2s

    inner = 128
    x = jnp.asarray(rng.standard_normal((1, 4, 6, 4 * inner))
                    .astype(np.float32))
    g = jnp.asarray(rng.standard_normal((1, 8, 12, inner)).astype(np.float32))
    _, vjp = jax.vjp(lambda t: interleave_d2s(t, inner), x)
    (dx,) = vjp(g)
    np.testing.assert_array_equal(np.asarray(dx),
                                  np.asarray(gather_s2d(g, inner)))
    # second order (R1 path): linear op — vjp of vjp is d2s again
    _, vjp2 = jax.vjp(lambda t: gather_s2d(t, inner), g)
    (dg,) = vjp2(x)
    np.testing.assert_array_equal(np.asarray(dg),
                                  np.asarray(interleave_d2s(x, inner)))


def test_up_conv_blur_unpacked_matches_two_pass(rng):
    """Subpixel composed-conv up path == conv_transpose + blur (the
    reference `models/RestoreNet.py:297-312` arithmetic)."""
    from vspbfr_tpu.ops.modulated_conv import conv_transpose2d
    from vspbfr_tpu.ops.packed import up_conv_blur_unpacked

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 6)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 5)).astype(np.float32))
    taps = (1, 3, 3, 1)
    k, lk, factor = 3, 4, 2
    ref = conv_transpose2d(x, w, stride=2, padding=0)
    p = (lk - factor) - (k - 1)
    ref = blur(ref, taps, pad=((p + 1) // 2 + 1, p // 2 + 1),
               upsample_factor=factor)
    got = up_conv_blur_unpacked(x, w, taps)
    assert got.shape == ref.shape == (2, 16, 16, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_conv2d_dense_matches_xla(rng):
    """Pallas dense conv kernel == lax.conv (interpret mode), fwd + grad."""
    from vspbfr_tpu.ops.pallas_conv import _lax_conv, conv2d_dense

    x = jnp.asarray(rng.standard_normal((2, 8, 12, 128)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 128, 128)).astype(np.float32)
                    * 0.1)
    pads = ((1, 1), (1, 1))
    ref = _lax_conv(x, w, pads)
    got = conv2d_dense(x, w, pads, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    # asymmetric pads + non-square kernel (the assembled up-conv case)
    w2 = jnp.asarray(rng.standard_normal((2, 2, 128, 128)).astype(np.float32)
                     * 0.1)
    pads2 = ((0, 1), (1, 0))
    ref2 = _lax_conv(x, w2, pads2)
    got2 = conv2d_dense(x, w2, pads2, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=1e-4, atol=1e-5)

    g = jnp.ones_like(ref)
    _, vjp_p = jax.vjp(lambda x_, w_: conv2d_dense(x_, w_, pads,
                                                   interpret=True), x, w)
    _, vjp_r = jax.vjp(lambda x_, w_: _lax_conv(x_, w_, pads), x, w)
    for a, b in zip(vjp_p(g), vjp_r(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    # in_scale (the folded style multiply), f32 and bf16 (the bf16 variant
    # regressed in r2: a dynamic per-batch row load was unprovably aligned)
    s = jnp.asarray((rng.standard_normal((2, 128)) * 0.2 + 1.0)
                    .astype(np.float32))
    ref3 = _lax_conv(x * s[:, None, None, :], w, pads)
    got3 = conv2d_dense(x, w, pads, in_scale=s, interpret=True)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(ref3),
                               rtol=1e-4, atol=1e-5)
    xb, wb, sb = (v.astype(jnp.bfloat16) for v in (x, w, s))
    refb = _lax_conv(xb * sb[:, None, None, :], wb, pads)
    gotb = conv2d_dense(xb, wb, pads, in_scale=sb, interpret=True)
    assert gotb.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(gotb, np.float32),
                               np.asarray(refb, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_pallas_conv2d_double_grad_r1(rng):
    """R1 needs reverse-over-reverse through D's convs; the custom-vjp
    Pallas conv must support it with exact values (D path gate)."""
    from vspbfr_tpu.ops.pallas_conv import _lax_conv, conv2d_dense

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 128)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 128, 128)).astype(np.float32)
                    * 0.05)
    pads = ((1, 1), (1, 1))

    def r1_grad(conv):
        def f(w_, x_):
            g = jax.grad(lambda a, b: jnp.sum(conv(a, b) ** 2))(x_, w_)
            return jnp.sum(g ** 2)
        return jax.grad(f)(w, x)

    gp = r1_grad(lambda a, b: conv2d_dense(a, b, pads, interpret=True))
    gx = r1_grad(lambda a, b: _lax_conv(a, b, pads))
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-3, atol=2e-3)


def test_conv_epilogue_matches_reference(rng):
    """Fused epilogue kernel == XLA composition (interpret), incl. vjp and
    the D-path double grad (ConvLayer activate routes through it)."""
    from vspbfr_tpu.ops.pallas_epilogue import conv_epilogue, epilogue_ref

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 128)).astype(np.float32))
    osc = jnp.asarray((rng.standard_normal((2, 128)) * 0.1 + 1)
                      .astype(np.float32))
    nz4 = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    nz1 = jnp.asarray(rng.standard_normal((2, 8, 8, 1)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((128,)).astype(np.float32))

    for args in [(osc, nz4, bias, True), (None, nz1, bias, True),
                 (None, None, bias, True), (osc, nz4, None, False),
                 (None, None, None, True)]:
        o, n, b_, act = args
        ref = epilogue_ref(x, o, n, b_, act)
        got = conv_epilogue(x, o, n, b_, act, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    # vjp vs reference
    def f_p(x, o, n, b_):
        return jnp.sum(conv_epilogue(x, o, n, b_, True, interpret=True) ** 2)

    def f_r(x, o, n, b_):
        return jnp.sum(epilogue_ref(x, o, n, b_, True) ** 2)

    gp = jax.grad(f_p, argnums=(0, 1, 2, 3))(x, osc, nz4, bias)
    gr = jax.grad(f_r, argnums=(0, 1, 2, 3))(x, osc, nz4, bias)
    for a, b2 in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   rtol=1e-4, atol=1e-4)

    # double grad (R1 through D's ConvLayer activations)
    def r1(b_, x):
        g = jax.grad(lambda x_: jnp.sum(
            conv_epilogue(x_, None, None, b_, True, interpret=True) ** 2))(x)
        return jnp.sum(g ** 2)
    gg = jax.grad(r1)(bias, x)
    assert bool(jnp.all(jnp.isfinite(gg)))
