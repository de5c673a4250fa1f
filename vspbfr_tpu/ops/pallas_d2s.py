"""Pallas phase-interleave (depth-to-space) kernel.

The subpixel formulation of stride-2 transposed convs produces 4 phase
arrays (B, Hp, Wp, C) that must interleave into (B, 2Hp, 2Wp, C). XLA
implements the stack+reshape as HBM-layout copies that dominate the whole
conv (measured ~30ms at 1024^2x32 on v5e).

EXPERIMENTAL: numerically correct (tested against the XLA form) but Mosaic
stack-allocates the in-kernel reshape intermediates and exceeds the 16MB
scoped-VMEM limit at production shapes — needs a strided-store formulation
before it can be wired into the hot path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def interleave_2x2(p00, p01, p10, p11):
    """out[b, 2i+a, 2j+c] = p_{ac}[b, i, j]; inputs (B, Hp, Wp, C)."""
    from jax.experimental import pallas as pl

    from jax.experimental.pallas import tpu as pltpu

    b, hp, wp, c = p00.shape

    # small fixed blocks: 4 inputs (1,h_t,wp,c) + output (1,2h_t,2wp,c),
    # double-buffered; keep total well under the 16MB scoped-vmem limit
    bytes_per_row = wp * c * 4
    h_t = max(1, min(hp, (512 * 1024) // bytes_per_row))
    while hp % h_t:
        h_t -= 1

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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=14 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(p00, p01, p10, p11)


def interleave_2x2_xla(p00, p01, p10, p11):
    """Reference XLA stack+reshape form (for tests/benchmarks)."""
    b, hp, wp, c = p00.shape
    r0 = jnp.stack([p00, p01], axis=3).reshape(b, hp, 2 * wp, c)
    r1 = jnp.stack([p10, p11], axis=3).reshape(b, hp, 2 * wp, c)
    return jnp.stack([r0, r1], axis=2).reshape(b, 2 * hp, 2 * wp, c)
