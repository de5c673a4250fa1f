"""TPU benchmark + numerics check: fused Pallas SMART kernel vs the XLA
packed composition at production shapes."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from vspbfr_tpu.ops.pallas_smart import smart_core


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


def main():
    k = jax.random.key(0)
    for (b, hg, c, dt) in [(4, 256, 64, jnp.float32),
                           (4, 256, 64, jnp.bfloat16),
                           (4, 128, 128, jnp.float32),
                           (4, 128, 128, jnp.bfloat16),
                           (4, 64, 256, jnp.float32)]:
        cb = c // 4
        xp = jax.random.normal(jax.random.fold_in(k, 0),
                               (b, hg, hg, 4 * c)).astype(dt)
        style = (jax.random.normal(jax.random.fold_in(k, 1), (b, c)) * 0.2
                 + 1.0).astype(dt)
        ws = [jax.random.normal(jax.random.fold_in(k, 2 + i),
                                (3, 3, c, cb)).astype(dt) * 0.3
              for i in range(4)]
        wf = (jax.random.normal(jax.random.fold_in(k, 9),
                                (3, 3, 4 * cb, c)) * 0.3).astype(dt)

        f_ref = jax.jit(lambda xp, s: smart_core(xp, s, ws, wf,
                                                 mode="reference"))
        f_pal = jax.jit(lambda xp, s: smart_core(xp, s, ws, wf,
                                                 mode="pallas"))
        o_ref = f_ref(xp, style)
        o_pal = f_pal(xp, style)
        err = float(jnp.max(jnp.abs(o_ref.astype(jnp.float32)
                                    - o_pal.astype(jnp.float32))))
        rel = err / float(jnp.std(o_ref.astype(jnp.float32)))
        t_ref = timeit(lambda i: f_ref(xp, style))
        t_pal = timeit(lambda i: f_pal(xp, style))
        tag = "bf16" if dt == jnp.bfloat16 else "f32 "
        print(f"SMART {2*hg}^2 C={c} {tag}: xla {t_ref*1e3:7.2f} ms  "
              f"pallas {t_pal*1e3:7.2f} ms  ({t_ref/t_pal:4.1f}x)  "
              f"maxerr/std {rel:.2e}")


if __name__ == "__main__":
    main()
