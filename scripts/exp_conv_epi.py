"""Measure the fused conv+epilogue store (conv2d_dense_epilogue) vs the
shipped two-pass composition (conv2d_dense + conv_epilogue) at the product
StyledConv shapes.

Expected win: the epilogue rides the f32 accumulator before the store, so
the conv output never round-trips HBM — saves ~2 x tensor_bytes / 819 GB/s
per instance (0.33 ms at the 512-res packed shape, bf16).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_conv_epi.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


SHAPES = [
    # (label, x-shape (packed/unpacked NHWC), cout_lanes, nc)
    ("512-res packed  (dec+res)", (4, 256, 256, 256), 256, 4),
    ("256-res unpacked (dec)   ", (4, 256, 256, 128), 128, 1),
    ("128-res unpacked        ", (4, 128, 128, 256), 256, 1),
]


def main():
    from vspbfr_tpu.ops.pallas_conv import conv2d_dense, conv2d_dense_epilogue
    from vspbfr_tpu.ops.pallas_epilogue import conv_epilogue
    from vspbfr_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    k = jax.random.key(0)
    dt = jnp.bfloat16
    pads = ((1, 1), (1, 1))

    def t(fn, n=30):
        out = fn()
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        float(np.asarray(jnp.sum(out.astype(jnp.float32))))
        return (time.perf_counter() - t0) / n * 1e3

    for label, xs, co, nc in SHAPES:
        b, h, wd, _ = xs
        x = jax.random.normal(k, xs, dt)
        w = jax.random.normal(k, (3, 3, xs[3], co), dt) * 0.05
        isc = jax.random.normal(k, (b, xs[3]), dt) * 0.2 + 1.0
        osc = jax.random.normal(k, (b, co), dt) * 0.1 + 0.5
        nz = jax.random.normal(k, (b, h, wd, nc), dt)
        bias = jax.random.normal(k, (co,), dt) * 0.1

        two = jax.jit(lambda x_, w_, i_, o_, n_, b_: conv_epilogue(
            conv2d_dense(x_, w_, pads, in_scale=i_), o_, n_, b_, act=True))
        one = jax.jit(lambda x_, w_, i_, o_, n_, b_: conv2d_dense_epilogue(
            x_, w_, pads, i_, o_, n_, b_, act=True))

        ya = two(x, w, isc, osc, nz, bias)
        yb = one(x, w, isc, osc, nz, bias)
        err = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                    - yb.astype(jnp.float32))))
        ta = t(lambda: two(x, w, isc, osc, nz, bias))
        tb = t(lambda: one(x, w, isc, osc, nz, bias))
        print(f"{label}: two-pass {ta:6.3f} ms  fused {tb:6.3f} ms "
              f"({ta / tb:4.2f}x)  max|err| {err:.3e}", flush=True)




def pieces():
    """Diagnostic: time conv and epilogue separately in the same harness."""
    from vspbfr_tpu.ops.pallas_conv import conv2d_dense
    from vspbfr_tpu.ops.pallas_epilogue import conv_epilogue
    from vspbfr_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    k = jax.random.key(0)
    dt = jnp.bfloat16
    pads = ((1, 1), (1, 1))

    def t(fn, n=30):
        out = fn()
        float(np.asarray(jnp.sum(out.astype(jnp.float32))))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        float(np.asarray(jnp.sum(out.astype(jnp.float32))))
        return (time.perf_counter() - t0) / n * 1e3

    for label, xs, co, nc in SHAPES:
        b, h, wd, _ = xs
        x = jax.random.normal(k, xs, dt)
        w = jax.random.normal(k, (3, 3, xs[3], co), dt) * 0.05
        isc = jax.random.normal(k, (b, xs[3]), dt) * 0.2 + 1.0
        osc = jax.random.normal(k, (b, co), dt) * 0.1 + 0.5
        nz = jax.random.normal(k, (b, h, wd, nc), dt)
        bias = jax.random.normal(k, (co,), dt) * 0.1
        z = jax.jit(lambda x_, w_, i_: conv2d_dense(
            x_, w_, pads, in_scale=i_))(x, w, isc)
        z.block_until_ready()
        conv_f = jax.jit(lambda x_, w_, i_: conv2d_dense(
            x_, w_, pads, in_scale=i_))
        epi_f = jax.jit(lambda z_, o_, n_, b_: conv_epilogue(
            z_, o_, n_, b_, act=True))
        tc = t(lambda: conv_f(x, w, isc))
        te = t(lambda: epi_f(z, osc, nz, bias))
        print(f"{label}: conv {tc:6.3f} ms  epi {te:6.3f} ms", flush=True)


if __name__ == "__main__":
    import sys
    pieces() if "pieces" in sys.argv else main()
