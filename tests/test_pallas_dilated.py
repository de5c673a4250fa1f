"""Golden tests for the d4|d8 dilated pair kernel (interpret mode on CPU).

Oracle: the two grouped/dense `lax.conv_general_dilated` calls the kernel
replaces (the exact lowering `ops/packed.py conv2d_packed` /
`ops/modulated_conv.py` use today) — i.e. the reference's
`Dilated_ModulatedConv2d` rates-[4,8] branch pair
(`/root/reference/models/RestoreNet.py:196-209`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vspbfr_tpu.ops.pallas_dilated import _pair_ref, dilated_pair_conv


def _inputs(ci, groups, seed=0, b=2, h=32, coa=4, cob=4, isc=True):
    k = jax.random.key(seed)
    cig = ci // groups
    x = jax.random.normal(jax.random.fold_in(k, 0), (b, h, h, ci))
    wa = jax.random.normal(jax.random.fold_in(k, 1), (3, 3, cig, coa)) * 0.3
    wb = jax.random.normal(jax.random.fold_in(k, 2), (3, 3, cig, cob)) * 0.3
    s = (jax.random.normal(jax.random.fold_in(k, 3), (b, ci)) * 0.2 + 1.0
         if isc else None)
    return x, wa, wb, s


@pytest.mark.parametrize("groups,da,db", [(4, 2, 4), (1, 4, 8), (1, 2, 4)])
@pytest.mark.parametrize("isc", [True, False])
def test_pair_matches_two_convs(groups, da, db, isc):
    x, wa, wb, s = _inputs(16 * groups, groups, isc=isc)
    ref = _pair_ref(x, wa, wb, s, da, db, groups)
    out = dilated_pair_conv(x, wa, wb, da, db, groups, in_scale=s,
                            interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_pair_uneven_branch_widths():
    x, wa, wb, s = _inputs(16, 1, coa=4, cob=8)
    ref = _pair_ref(x, wa, wb, s, 4, 8, 1)
    out = dilated_pair_conv(x, wa, wb, 4, 8, 1, in_scale=s, interpret=True)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_pair_grads_match_reference():
    x, wa, wb, s = _inputs(32, 4)

    def loss(fn):
        def f(x_, wa_, wb_, s_):
            return jnp.sum(jnp.sin(fn(x_, wa_, wb_, s_)))
        return f

    ref_g = jax.grad(loss(lambda *a: _pair_ref(*a, 2, 4, 4)),
                     argnums=(0, 1, 2, 3))(x, wa, wb, s)
    out_g = jax.grad(
        loss(lambda x_, wa_, wb_, s_: dilated_pair_conv(
            x_, wa_, wb_, 2, 4, 4, in_scale=s_, interpret=True)),
        argnums=(0, 1, 2, 3))(x, wa, wb, s)
    for r, o in zip(ref_g, out_g):
        np.testing.assert_allclose(o, r, rtol=1e-4, atol=1e-5)


def test_pair_bf16_io_f32_accum():
    x, wa, wb, s = _inputs(16, 1)
    ref = _pair_ref(x, wa, wb, s, 4, 8, 1)
    out = dilated_pair_conv(x.astype(jnp.bfloat16), wa.astype(jnp.bfloat16),
                            wb.astype(jnp.bfloat16), 4, 8, 1,
                            in_scale=s.astype(jnp.bfloat16), interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(out.astype(jnp.float32), ref,
                               rtol=0.1, atol=0.1)


def test_quad_all_four_rates():
    """All four SMART rates (1,2,4,8) in one kernel (unpacked layout)."""
    x, _, _, s = _inputs(16, 1)
    k = jax.random.key(9)
    ws = [jax.random.normal(jax.random.fold_in(k, i), (3, 3, 16, 4)) * 0.3
          for i in range(4)]
    from vspbfr_tpu.ops.pallas_dilated import dilated_multi_conv, _multi_ref
    ref = _multi_ref(x, ws, s, None, (1, 2, 4, 8), 1)
    out = dilated_multi_conv(x, ws, (1, 2, 4, 8), 1, in_scale=s,
                             interpret=True)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
