"""Microbenchmark model building blocks at representative shapes on the
current device (queue-then-flush timing; see profile_stages.py)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from vspbfr_tpu.models.layers import SMARTLayer, StyledConv
from vspbfr_tpu.ops import conv2d, conv_transpose2d, upsample2d


def flush(x):
    return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0])))


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


def bench(name, fn):
    print(f"{name:38s} {1e3 * timeit(fn):8.2f} ms")


def main():
    b = 4
    key = jax.random.key(0)

    for res, c in [(512, 64), (256, 128), (1024, 32)]:
        x = jax.random.normal(key, (b, res, res, c))
        w = jax.random.normal(key, (3, 3, c, c)) * 0.05
        s = jax.random.normal(key, (b, c))

        conv = jax.jit(lambda x, w: conv2d(x, w, padding=1))
        bench(f"conv3x3      {res}^2 x{c}", lambda i, x=x, w=w: conv(x, w))

        convT = jax.jit(lambda x, w: conv_transpose2d(x, w, stride=2))
        bench(f"convT 2x     {res}^2 x{c}", lambda i, x=x, w=w: convT(x, w))

        up = jax.jit(lambda x: upsample2d(x, (1, 3, 3, 1)))
        bench(f"blur-up 2x   {res}^2 x{c}", lambda i, x=x: up(x))

        conv_d8 = jax.jit(lambda x, w: conv2d(x, w, padding=8, dilation=8))
        bench(f"conv3x3 d8   {res}^2 x{c}", lambda i, x=x, w=w: conv_d8(x, w))

        smart = SMARTLayer(features=c)
        sp = smart.init({"params": key, "noise": key}, x, s)["params"]
        smart_fn = jax.jit(lambda p, x, s, k: smart.apply(
            {"params": p}, x, s, rngs={"noise": k}))
        bench(f"SMART(4 dil) {res}^2 x{c}",
              lambda i, x=x, s=s: smart_fn(sp, x, s, jax.random.key(i)))

        sc = StyledConv(c, upsample=True)
        scp = sc.init({"params": key, "noise": key}, x, s)["params"]
        sc_fn = jax.jit(lambda p, x, s, k: sc.apply(
            {"params": p}, x, s, rngs={"noise": k}))
        bench(f"StyledConv up {res}^2 x{c}",
              lambda i, x=x, s=s: sc_fn(scp, x, s, jax.random.key(i)))
        print()


if __name__ == "__main__":
    main()
