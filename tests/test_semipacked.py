"""Golden tests for the width-only (semi-packed) layout ops.

Oracle: the same conv on the unpacked tensor via lax.conv_general_dilated
(the layout is exact in infinite precision, like ops/packed.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vspbfr_tpu.ops.packed import space_to_depth
from vspbfr_tpu.ops.semipacked import (
    conv1x1_semipacked,
    conv2d_semipacked,
    pack_vector_w,
    packed_to_semipacked,
    semipacked_to_packed,
    space_to_width,
    width_to_space,
)

_DN = ("NHWC", "HWIO", "NHWC")


def _oracle(x, w, dilation=1):
    pad = ((w.shape[0] - 1) * dilation) // 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((pad, pad), (pad, pad)),
        rhs_dilation=(dilation, dilation), dimension_numbers=_DN)


def test_width_roundtrip_and_layout(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    xp = space_to_width(x)
    assert xp.shape == (2, 8, 4, 6)
    # phase-major: out[..., i, j, b*C + c] = x[..., i, 2j + b, c]
    np.testing.assert_array_equal(np.asarray(xp[0, 3, 1, 3 + 2]),
                                  np.asarray(x[0, 3, 3, 2]))
    np.testing.assert_array_equal(np.asarray(width_to_space(xp)),
                                  np.asarray(x))


def test_packed_semipacked_conversion(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 5)).astype(np.float32))
    pk = space_to_depth(x)
    sp = packed_to_semipacked(pk)
    np.testing.assert_array_equal(np.asarray(sp),
                                  np.asarray(space_to_width(x)))
    np.testing.assert_array_equal(np.asarray(semipacked_to_packed(sp)),
                                  np.asarray(pk))


@pytest.mark.parametrize("k", [1, 3, 5])
def test_conv2d_semipacked_dense(rng, k):
    x = jnp.asarray(rng.normal(size=(2, 10, 12, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, k, 4, 6)).astype(np.float32))
    if k == 1:
        got = conv1x1_semipacked(space_to_width(x), w)
    else:
        got = conv2d_semipacked(space_to_width(x), w)
    np.testing.assert_allclose(np.asarray(width_to_space(got)),
                               np.asarray(_oracle(x, w)),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("d", [2, 4, 8])
@pytest.mark.parametrize("groups_hint", [True, False])
def test_conv2d_semipacked_even_dilation(rng, d, groups_hint):
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 5)).astype(np.float32))
    got = conv2d_semipacked(space_to_width(x), w, dilation=d,
                            groups_hint=groups_hint)
    np.testing.assert_allclose(np.asarray(width_to_space(got)),
                               np.asarray(_oracle(x, w, dilation=d)),
                               rtol=1e-5, atol=1e-5)


def test_conv2d_semipacked_in_scale(rng):
    """Per-sample input scale folds like multiplying x up front."""
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 4)).astype(np.float32))
    s = jnp.asarray(rng.uniform(0.5, 1.5, (2, 4)).astype(np.float32))
    sp = pack_vector_w(s)
    xp = space_to_width(x)
    got = conv2d_semipacked(xp, w, in_scale=sp)
    want = conv2d_semipacked(xp * sp[:, None, None, :], w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_conv2d_semipacked_grad_matches_unpacked(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 3)).astype(np.float32))

    def f_sp(w):
        y = conv2d_semipacked(space_to_width(x), w)
        return jnp.sum(jnp.tanh(y))

    def f_ref(w):
        return jnp.sum(jnp.tanh(space_to_width(_oracle(x, w))))

    np.testing.assert_allclose(np.asarray(jax.grad(f_sp)(w)),
                               np.asarray(jax.grad(f_ref)(w)),
                               rtol=1e-4, atol=1e-5)


def test_conv2d_semipacked_bf16_dtype(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4))).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 4))).astype(jnp.bfloat16)
    out = conv2d_semipacked(space_to_width(x), w)
    assert out.dtype == jnp.bfloat16
    out = conv2d_semipacked(space_to_width(x), w, dilation=2)
    assert out.dtype == jnp.bfloat16
