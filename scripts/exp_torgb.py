"""Decompose the packed ToRGB + skip-chain cost at the production decoder
shapes (b4, f32): conv1x1 -> bias -> skip upsample (16-phase conv +
interleave) -> final depth_to_space. Finds where the ~5.7 ms at 1024 goes."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from vspbfr_tpu.ops.packed import (
    conv1x1_packed,
    depth_to_space,
    upsample2d_packed,
)


def flush(x):
    return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32))))


def timeit(fn, n=20):
    def run(k):
        out = None
        t0 = time.perf_counter()
        for i in range(k):
            out = fn(i)
        flush(out)
        return time.perf_counter() - t0

    run(1)
    return (run(2 + n) - run(2)) / n


def main(b=4):
    key = jax.random.key(0)
    for res, c in ((1024, 32), (512, 64)):
        h = res // 2
        x = jax.random.normal(key, (b, h, h, 4 * c))      # packed features
        w = jax.random.normal(key, (1, 1, c, 3)) * 0.1
        skip = jax.random.normal(key, (b, h // 2, h // 2, 12))  # packed rgb @ res/2

        conv = jax.jit(lambda x, w: conv1x1_packed(x, w))
        up = jax.jit(lambda s: upsample2d_packed(s, (1, 3, 3, 1),
                                                 packed_in=True))
        d2s = jax.jit(lambda y: depth_to_space(y))

        t_conv = timeit(lambda i: conv(x, w))
        t_up = timeit(lambda i: up(skip))
        rgb = conv(x, w)
        t_d2s = timeit(lambda i: d2s(rgb))
        print(f"res {res}: conv1x1 {1e3*t_conv:6.2f}  skip_up {1e3*t_up:6.2f}"
              f"  final_d2s {1e3*t_d2s:6.2f} ms")


if __name__ == "__main__":
    main()
