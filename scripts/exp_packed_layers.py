"""Layer-level packed vs unpacked timing at the pipeline hot shapes."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from vspbfr_tpu.models.layers import SMARTLayer, StyledConv, ToRGB
from vspbfr_tpu.ops.packed import space_to_depth


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


def bench(name, fn):
    print(f"{name:48s} {1e3 * timeit(fn):8.2f} ms")


def main():
    key = jax.random.key(0)
    b = 4
    for dt in (jnp.float32, jnp.bfloat16):
        tag = "bf16" if dt == jnp.bfloat16 else "f32 "
        for (r, c) in [(512, 64), (1024, 32)]:
            x = jax.random.normal(key, (b, r, r, c)).astype(dt)
            xp = space_to_depth(x)
            s = jax.random.normal(key, (b, 2 * 512)).astype(dt)

            for packed in (False, True):
                sm = SMARTLayer(features=c, packed=packed)
                xin = xp if packed else x
                p = sm.init({"params": key, "noise": key}, xin, s)["params"]
                fn = jax.jit(lambda p, x, s, k: sm.apply(
                    {"params": p}, x, s, rngs={"noise": k}))
                bench(f"SMART {r}^2x{c} {tag} packed={packed}",
                      lambda i, xin=xin, p=p: fn(p, xin, s, jax.random.key(i)))

            # up-styledconv r/2 -> r
            cin = 2 * c
            xi = jax.random.normal(key, (b, r // 2, r // 2, cin)).astype(dt)
            for packed in (False, True):
                sc = StyledConv(c, upsample=True, packed_in=False,
                                packed_out=packed)
                p = sc.init({"params": key, "noise": key}, xi, s)["params"]
                fn = jax.jit(lambda p, x, s, k: sc.apply(
                    {"params": p}, x, s, rngs={"noise": k}))
                bench(f"StyledConv-up ->{r}^2x{c} {tag} packed={packed}",
                      lambda i, p=p: fn(p, xi, s, jax.random.key(i)))

            # up-styledconv packed-in (r/2 packed -> r packed)
            xip = space_to_depth(xi)
            sc = StyledConv(c, upsample=True, packed_in=True, packed_out=True)
            p = sc.init({"params": key, "noise": key}, xip, s)["params"]
            fn = jax.jit(lambda p, x, s, k: sc.apply(
                {"params": p}, x, s, rngs={"noise": k}))
            bench(f"StyledConv-up ->{r}^2x{c} {tag} pk-in/out",
                  lambda i, p=p: fn(p, xip, s, jax.random.key(i)))
            print()


if __name__ == "__main__":
    main()
