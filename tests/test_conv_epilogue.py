"""Fused conv+epilogue kernel (ops/pallas_conv.py conv2d_dense_epilogue).

Exactness against the XLA reference composition (conv -> demod scale ->
noise -> bias -> lrelu -> post-adds -> optional second stage), forward and
through first/second derivatives (the R1 path double-differentiates the
discriminator's fused convs). Runs the Pallas kernel in interpret mode on
CPU; the same code path compiles on TPU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vspbfr_tpu.ops.pallas_conv import (
    _epi_ref,
    _scaled_ref,
    conv2d_dense_epilogue,
)

B, H, W, CI, CO = 2, 8, 16, 128, 128
PADS = ((1, 1), (1, 1))


def _args(rng, nc=4, with_osc=True, with_bias=True, n_post=0, stage2=False):
    r = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    a = dict(
        x=r(B, H, W, CI),
        w=r(3, 3, CI, CO) * 0.1,
        in_scale=r(B, CI) * 0.2 + 1.0,
        out_scale=(r(B, CO) * 0.1 + 0.7) if with_osc else None,
        noise=r(B, H, W, nc) * 0.3 if nc else None,
        bias=r(CO) * 0.1 if with_bias else None,
        post_add=tuple(r(B, H, W, CO) for _ in range(n_post)),
    )
    if stage2:
        a.update(noise2=r(B, H, W, 4) * 0.3, bias2=r(CO) * 0.1, act2=True)
    return a


def _ref(x, w, in_scale, out_scale, noise, bias, post_add=(),
         noise2=None, bias2=None, act2=False, act=True):
    return _epi_ref(_scaled_ref(x, w, in_scale, PADS), out_scale, noise,
                    bias, act, post_add, noise2, bias2, act2)


CASES = [
    dict(nc=4, with_osc=True, with_bias=True),
    dict(nc=1, with_osc=True, with_bias=True),
    dict(nc=0, with_osc=False, with_bias=True),
    dict(nc=0, with_osc=True, with_bias=False),
    dict(nc=4, with_osc=True, with_bias=True, n_post=2),
    dict(nc=0, with_osc=False, with_bias=True, n_post=1),
    dict(nc=4, with_osc=True, with_bias=True, stage2=True),
    dict(nc=0, with_osc=False, with_bias=True, stage2=True),
]


@pytest.mark.parametrize("case", CASES)
def test_forward_matches_reference(rng, case):
    a = _args(rng, **case)
    got = conv2d_dense_epilogue(a["x"], a["w"], PADS, a["in_scale"],
                                a["out_scale"], a["noise"], a["bias"],
                                act=True, post_add=a["post_add"],
                                noise2=a.get("noise2"), bias2=a.get("bias2"),
                                act2=a.get("act2", False), interpret=True)
    want = _ref(a["x"], a["w"], a["in_scale"], a["out_scale"], a["noise"],
                a["bias"], a["post_add"], a.get("noise2"), a.get("bias2"),
                a.get("act2", False))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("case", [CASES[0], CASES[4], CASES[6]])
def test_gradients_match_reference(rng, case):
    a = _args(rng, **case)
    diff = {k: v for k, v in a.items()
            if v is not None and k not in ("post_add", "act2")}
    diff_post = a["post_add"]

    def fused(kw, post):
        full = {k: kw.get(k) for k in
                ("x", "w", "in_scale", "out_scale", "noise", "bias")}
        return jnp.sum(conv2d_dense_epilogue(
            full["x"], full["w"], PADS, full["in_scale"],
            full["out_scale"], full["noise"], full["bias"], act=True,
            post_add=post, noise2=kw.get("noise2"), bias2=kw.get("bias2"),
            act2=a.get("act2", False), interpret=True) ** 2)

    def ref(kw, post):
        full = {k: kw.get(k) for k in
                ("x", "w", "in_scale", "out_scale", "noise", "bias")}
        return jnp.sum(_ref(full["x"], full["w"], full["in_scale"],
                            full["out_scale"], full["noise"], full["bias"],
                            post, kw.get("noise2"), kw.get("bias2"),
                            a.get("act2", False)) ** 2)

    gf = jax.grad(fused, argnums=(0, 1))(diff, diff_post)
    gr = jax.grad(ref, argnums=(0, 1))(diff, diff_post)
    flat_f, _ = jax.tree_util.tree_flatten(gf)
    flat_r, _ = jax.tree_util.tree_flatten(gr)
    assert len(flat_f) == len(flat_r)
    for vf, vr in zip(flat_f, flat_r):
        np.testing.assert_allclose(np.asarray(vf), np.asarray(vr),
                                   rtol=5e-4, atol=5e-4)


def test_double_grad_r1_style(rng):
    """R1: grad wrt the INPUT image, then grad of its norm wrt weights —
    exercises d(bwd)/d(everything) through the fused kernel."""
    a = _args(rng, nc=0, with_osc=False, with_bias=True)

    def d_out(x, w, bias):
        return conv2d_dense_epilogue(x, w, PADS, None, None, None, bias,
                                     act=True, interpret=True)

    def d_ref(x, w, bias):
        return _ref(x, w, None, None, None, bias)

    def penalty(f, x, w, bias):
        gx = jax.grad(lambda x_: jnp.sum(f(x_, w, bias)))(x)
        return jnp.sum(gx ** 2)

    for arg in (1, 2):
        gf = jax.grad(penalty, argnums=arg + 1)(d_out, a["x"], a["w"],
                                                a["bias"])
        gr = jax.grad(penalty, argnums=arg + 1)(d_ref, a["x"], a["w"],
                                                a["bias"])
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-3, atol=1e-3)


def test_dilated_out_scale(rng):
    """demod out_scale folded into the multi-dilation kernel's stores."""
    from vspbfr_tpu.ops.pallas_dilated import _multi_ref, dilated_multi_conv

    r = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    x = r(2, 8, 16, 128)
    ws = (r(3, 3, 32, 16) * 0.1, r(3, 3, 32, 16) * 0.1)
    isc = r(2, 128) * 0.2 + 1.0
    osc = r(2, 128) * 0.1 + 0.7
    got = dilated_multi_conv(x, ws, (2, 4), groups=4, in_scale=isc,
                             out_scale=osc, interpret=True)
    want = _multi_ref(x, ws, isc, osc, (2, 4), 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    def loss(fn, x, ws, isc, osc):
        return jnp.sum(fn(x, ws, (2, 4), 4, isc, osc) ** 2)

    gf = jax.grad(lambda *a: loss(
        functools.partial(dilated_multi_conv, interpret=True)
        if False else
        (lambda x_, ws_, d_, g_, i_, o_: dilated_multi_conv(
            x_, ws_, d_, g_, in_scale=i_, out_scale=o_, interpret=True)),
        *a), argnums=(0, 3))(x, ws, isc, osc)
    gr = jax.grad(lambda *a: loss(
        (lambda x_, ws_, d_, g_, i_, o_: _multi_ref(x_, ws_, i_, o_, d_,
                                                    g_)),
        *a), argnums=(0, 3))(x, ws, isc, osc)
    for vf, vr in zip(jax.tree_util.tree_leaves(gf),
                      jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(vf), np.asarray(vr),
                                   rtol=5e-4, atol=5e-4)
