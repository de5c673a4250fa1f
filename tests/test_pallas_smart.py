"""Golden tests for the fused SMART kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vspbfr_tpu.ops.pallas_smart import smart_core
from vspbfr_tpu.ops.packed import space_to_depth


def _inputs(b=2, hg=16, wg=16, c=8, cb=2, cout=8, seed=0):
    k = jax.random.key(seed)
    xp = jax.random.normal(jax.random.fold_in(k, 0), (b, hg, wg, 4 * c))
    style = jax.random.normal(jax.random.fold_in(k, 1), (b, c)) * 0.2 + 1.0
    ws = [jax.random.normal(jax.random.fold_in(k, 2 + i), (3, 3, c, cb)) * 0.3
          for i in range(4)]
    wf = jax.random.normal(jax.random.fold_in(k, 9), (3, 3, 4 * cb, cout)) * 0.3
    return xp, style, ws, wf


@pytest.mark.parametrize("demod", [True, False])
def test_smart_core_interpret_matches_reference(demod):
    xp, style, ws, wf = _inputs()
    ref = smart_core(xp, style, ws, wf, demodulate=demod, mode="reference")
    out = smart_core(xp, style, ws, wf, demodulate=demod, mode="interpret")
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_smart_core_grad_matches_reference():
    xp, style, ws, wf = _inputs(b=1, hg=8, wg=8)

    def loss_fused(xp, style, w1, w2, w3, w4, wf):
        o = smart_core(xp, style, [w1, w2, w3, w4], wf, mode="interpret")
        return jnp.sum(o ** 2)

    def loss_ref(xp, style, w1, w2, w3, w4, wf):
        o = smart_core(xp, style, [w1, w2, w3, w4], wf, mode="reference")
        return jnp.sum(o ** 2)

    args = (xp, style, *ws, wf)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(a, b_, rtol=1e-3, atol=1e-4)
