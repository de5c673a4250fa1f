"""Can the Pallas d2s/s2d kernels run at small inner (RGB: 12->3)?
Measures the XLA fallback vs the Pallas form at the production RGB shapes."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from vspbfr_tpu.ops.pallas_d2s import _d2s_pallas, _d2s_xla, _s2d_pallas, _s2d_xla


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
    for h, inner, tag in ((512, 3, "final-rgb@1024"), (256, 3, "final-rgb@512"),
                          (256, 12, "skipup16@1024"), (128, 12, "skipup16@512")):
        x = jax.random.normal(key, (b, h, h, 4 * inner))
        fx = jax.jit(lambda x: _d2s_xla(x, inner))
        ref = fx(x)
        try:
            fp = jax.jit(lambda x: _d2s_pallas(x, inner))
            out = fp(x)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-6, atol=1e-6)
            t_p = 1e3 * timeit(lambda i: fp(x))
            ok = f"pallas {t_p:6.2f} ms"
        except Exception as e:
            ok = f"pallas FAIL: {type(e).__name__} {str(e)[:80]}"
        t_x = 1e3 * timeit(lambda i: fx(x))
        print(f"{tag:16s} (h={h}, inner={inner}): xla {t_x:6.2f} ms   {ok}")

    # reverse (s2d) at the training-noise shape
    y = jax.random.normal(key, (b, 512, 512, 1))
    fx = jax.jit(lambda y: _s2d_xla(y, 1))
    ref = fx(y)
    try:
        fp = jax.jit(lambda y: _s2d_pallas(y, 1))
        np.testing.assert_allclose(np.asarray(fp(y)), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)
        t_p = 1e3 * timeit(lambda i: fp(y))
        ok = f"pallas {t_p:6.2f} ms"
    except Exception as e:
        ok = f"pallas FAIL: {type(e).__name__} {str(e)[:80]}"
    print(f"s2d noise (512,1): xla {1e3 * timeit(lambda i: fx(y)):6.2f} ms   {ok}")


if __name__ == "__main__":
    main()
