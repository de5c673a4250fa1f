"""Experiment: 2x2 phase interleave (depth-to-space) formulations on TPU.

The subpixel transposed-conv path needs out[b, 2i+a, 2j+c] = p_{ac}[b, i, j].
XLA's stack+reshape lowering is HBM-copy bound (~30ms at 1024^2x32 on v5e);
this compares it against a Pallas strided-store kernel.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def interleave_xla(p00, p01, p10, p11):
    b, hp, wp, c = p00.shape
    r0 = jnp.stack([p00, p01], axis=3).reshape(b, hp, 2 * wp, c)
    r1 = jnp.stack([p10, p11], axis=3).reshape(b, hp, 2 * wp, c)
    return jnp.stack([r0, r1], axis=2).reshape(b, 2 * hp, 2 * wp, c)


def interleave_pallas(p00, p01, p10, p11):
    b, hp, wp, c = p00.shape

    bytes_per_in_row = wp * c * p00.dtype.itemsize
    # 4 in blocks (h_t rows) + out block (4x) double buffered -> keep ~2MB
    h_t = max(1, min(hp, (2 * 1024 * 1024) // (8 * bytes_per_in_row)))
    while hp % h_t:
        h_t -= 1

    def kernel(r00, r01, r10, r11, o_ref):
        o_ref[0, pl.Slice(0, h_t, 2), pl.Slice(0, wp, 2), :] = r00[0]
        o_ref[0, pl.Slice(0, h_t, 2), pl.Slice(1, wp, 2), :] = r01[0]
        o_ref[0, pl.Slice(1, h_t, 2), pl.Slice(0, wp, 2), :] = r10[0]
        o_ref[0, pl.Slice(1, h_t, 2), pl.Slice(1, wp, 2), :] = r11[0]

    in_spec = pl.BlockSpec((1, h_t, wp, c), lambda ib, ih: (ib, ih, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 2 * h_t, 2 * wp, c),
                            lambda ib, ih: (ib, ih, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 2 * hp, 2 * wp, c), p00.dtype),
        grid=(b, hp // h_t),
        in_specs=[in_spec] * 4,
        out_specs=out_spec,
    )(p00, p01, p10, p11)


def interleave_pallas_w_only(p00, p01, p10, p11):
    """Variant: rows (H) interleaved by the grid/index_map (free addressing),
    only W needs an in-register strided store."""
    b, hp, wp, c = p00.shape
    bytes_per_in_row = wp * c * p00.dtype.itemsize
    h_t = max(1, min(hp, (2 * 1024 * 1024) // (8 * bytes_per_in_row)))
    while hp % h_t:
        h_t -= 1

    def kernel(r00, r01, r10, r11, o_ref):
        a = pl.program_id(2)

        @pl.when(a == 0)
        def _():
            o_ref[0, :, pl.Slice(0, wp, 2), :] = r00[0]
            o_ref[0, :, pl.Slice(1, wp, 2), :] = r01[0]

        @pl.when(a == 1)
        def _():
            o_ref[0, :, pl.Slice(0, wp, 2), :] = r10[0]
            o_ref[0, :, pl.Slice(1, wp, 2), :] = r11[0]

    in_spec = pl.BlockSpec((1, h_t, wp, c),
                           lambda ib, ih, a: (ib, ih, 0, 0),
                           memory_space=pltpu.VMEM)
    # out rows for phase a: 2*ih*h_t + a + 2*k -> not blockable; instead use
    # a (1, h_t, 2wp) block whose H index is 2*ih + ... no: H-block stride
    # must be contiguous. Skip: only used to sanity check.
    raise SystemExit


def timeit(fn, *args, n=30):
    out = fn(*args)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / n


def main():
    key = jax.random.key(0)
    for (b, hp, wp, c) in [(4, 256, 256, 64), (4, 512, 512, 32),
                           (4, 128, 128, 128)]:
        ps = [jax.random.normal(jax.random.fold_in(key, i), (b, hp, wp, c),
                                jnp.float32) for i in range(4)]
        fx = jax.jit(interleave_xla)
        fp = jax.jit(interleave_pallas)
        ox, op = fx(*ps), fp(*ps)
        err = float(jnp.max(jnp.abs(ox - op)))
        gb = ox.size * 4 * 2 / 1e9
        tx, tp = timeit(fx, *ps), timeit(fp, *ps)
        print(f"({b},{hp},{wp},{c})->2x: err={err:.1e}  "
              f"xla {tx*1e3:7.2f} ms ({gb/tx:5.1f} GB/s)  "
              f"pallas {tp*1e3:7.2f} ms ({gb/tp:5.1f} GB/s)")


if __name__ == "__main__":
    main()
