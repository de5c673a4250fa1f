"""Pallas phase-interleave (depth-to-space) kernel.

The subpixel formulation of stride-2 transposed convs produces 4 phase
arrays (B, Hp, Wp, C) that must interleave into (B, 2Hp, 2Wp, C). XLA
implements the stack+reshape as HBM-layout copies that dominate the whole
conv (measured ~30ms at 1024^2x32 on v5e); this kernel does the shuffle in
VMEM on the way through.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def interleave_2x2(p00, p01, p10, p11):
    """out[b, 2i+a, 2j+c] = p_{ac}[b, i, j]; inputs (B, Hp, Wp, C)."""
    from jax.experimental import pallas as pl

    b, hp, wp, c = p00.shape

    # block over batch and rows; keep W, C whole (lanes = C)
    h_t = max(1, min(hp, 256 * 1024 // max(1, wp * c // 128)))
    while hp % h_t:
        h_t -= 1
    vmem_est = h_t * wp * c * 4 * 8  # 4 in + interleaved out (x2)
    while h_t > 1 and vmem_est > 8 * 1024 * 1024:
        h_t //= 2
        while hp % h_t:
            h_t -= 1
        vmem_est = h_t * wp * c * 4 * 8

    def kernel(r00, r01, r10, r11, o_ref):
        row0 = jnp.stack([r00[0], r01[0]], axis=2).reshape(h_t, 2 * wp, c)
        row1 = jnp.stack([r10[0], r11[0]], axis=2).reshape(h_t, 2 * wp, c)
        out = jnp.stack([row0, row1], axis=1).reshape(2 * h_t, 2 * wp, c)
        o_ref[0] = out

    in_spec = pl.BlockSpec((1, h_t, wp, c), lambda ib, ih: (ib, ih, 0, 0))
    out_spec = pl.BlockSpec((1, 2 * h_t, 2 * wp, c),
                            lambda ib, ih: (ib, ih, 0, 0))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 2 * hp, 2 * wp, c), p00.dtype),
        grid=(b, hp // h_t),
        in_specs=[in_spec] * 4,
        out_specs=out_spec,
        interpret=jax.default_backend() != "tpu",
    )(p00, p01, p10, p11)


def interleave_2x2_xla(p00, p01, p10, p11):
    """Reference XLA stack+reshape form (for tests/benchmarks)."""
    b, hp, wp, c = p00.shape
    r0 = jnp.stack([p00, p01], axis=3).reshape(b, hp, 2 * wp, c)
    r1 = jnp.stack([p10, p11], axis=3).reshape(b, hp, 2 * wp, c)
    return jnp.stack([r0, r1], axis=2).reshape(b, 2 * hp, 2 * wp, c)
