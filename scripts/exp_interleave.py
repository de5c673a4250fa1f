"""TPU benchmark: candidate forms of the 2x2 phase interleave (d2s).

The subpixel up-conv emits phase channels (gy, gx, inner) that must
interleave into space: (B, h, w, 4*inner) -> (B, 2h, 2w, inner). Candidates:

  xla8d   - the 8D double transpose currently in up_conv_blur_packed
            (inner further split (ay, ax, c) with c=32 minor — slow minor)
  xla6d   - clean 6D transpose with inner contiguous (weight channels
            pre-permuted to (gy, gx, inner) order)
  pallas_stack  - Pallas kernel, per-gy stack+reshape sublane interleave
  pallas_repeat - Pallas kernel, jnp.repeat + parity select
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


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


def xla8d(x, co):
    b, h, w, _ = x.shape
    o = x.reshape(b, h, w, 2, 2, 2, 2, co)
    o = jnp.transpose(o, (0, 1, 3, 2, 5, 4, 6, 7))
    return o.reshape(b, 2 * h, 2 * w, 4 * co)


def xla6d(x, inner):
    b, h, w, _ = x.shape
    o = x.reshape(b, h, w, 2, 2, inner)
    o = jnp.transpose(o, (0, 1, 3, 2, 4, 5))
    return o.reshape(b, 2 * h, 2 * w, inner)


def _pallas_call(x, inner, kernel_body, h_t):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, _ = x.shape
    out = pl.pallas_call(
        kernel_body,
        out_shape=jax.ShapeDtypeStruct((b, h, 2, 2 * w, inner), x.dtype),
        grid=(b, h // h_t),
        in_specs=[pl.BlockSpec((1, h_t, w, 4 * inner),
                               lambda ib, ih: (ib, ih, 0, 0))],
        out_specs=pl.BlockSpec((1, h_t, 2, 2 * w, inner),
                               lambda ib, ih: (ib, ih, 0, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x)
    return out.reshape(b, 2 * h, 2 * w, inner)


def pallas_stack(x, inner, h_t=4):
    w = x.shape[2]

    def kernel(x_ref, o_ref):
        xb = x_ref[0]  # (h_t, w, 4*inner), channels (gy, gx, inner)
        for gy in range(2):
            a = xb[:, :, (2 * gy) * inner:(2 * gy + 1) * inner]
            c = xb[:, :, (2 * gy + 1) * inner:(2 * gy + 2) * inner]
            st = jnp.stack([a, c], axis=2)            # (h_t, w, 2, inner)
            o_ref[0, :, gy] = st.reshape(st.shape[0], 2 * w, inner)

    return _pallas_call(x, inner, kernel, h_t)


def pallas_repeat(x, inner, h_t=4):
    w = x.shape[2]

    def kernel(x_ref, o_ref):
        xb = x_ref[0]
        col = jax.lax.broadcasted_iota(
            jnp.int32, (xb.shape[0], 2 * w, inner), 1)
        for gy in range(2):
            a = xb[:, :, (2 * gy) * inner:(2 * gy + 1) * inner]
            c = xb[:, :, (2 * gy + 1) * inner:(2 * gy + 2) * inner]
            ar = jnp.repeat(a, 2, axis=1)
            cr = jnp.repeat(c, 2, axis=1)
            o_ref[0, :, gy] = jnp.where(col % 2 == 0, ar, cr)

    return _pallas_call(x, inner, kernel, h_t)


def main():
    key = jax.random.key(0)
    # (4, 256, 256, 512) -> (4, 512, 512, 128): the 512->1024 decoder layer
    for (b, h, inner) in [(4, 256, 128), (4, 512, 128), (4, 128, 512)]:
        x = jax.random.normal(key, (b, h, h, 4 * inner))
        nbytes = 2 * x.size * 4 / 1e9

        # correctness vs xla6d oracle
        ref = xla6d(x, inner)
        for name, fn in [("pallas_stack", pallas_stack),
                         ("pallas_repeat", pallas_repeat)]:
            try:
                got = jax.jit(partial(fn, inner=inner))(x)
                ok = bool(jnp.all(got == ref))
            except Exception as e:
                print(f"{name} ({b},{h},{h},{4*inner}): FAIL {type(e).__name__}: {str(e)[:120]}")
                continue
            t = timeit(jax.jit(partial(fn, inner=inner)).__call__ and
                       (lambda i, f=jax.jit(partial(fn, inner=inner)): f(x)))
            print(f"{name} ({b},{h},{h},{4*inner}): ok={ok} {t*1e3:7.2f} ms "
                  f"{nbytes/t:6.0f} GB/s")

        co = inner // 4
        f8 = jax.jit(partial(xla8d, co=co))
        f6 = jax.jit(partial(xla6d, inner=inner))
        t8 = timeit(lambda i: f8(x))
        t6 = timeit(lambda i: f6(x))
        print(f"xla8d ({b},{h},{h},{4*inner}): {t8*1e3:7.2f} ms {nbytes/t8:6.0f} GB/s")
        print(f"xla6d ({b},{h},{h},{4*inner}): {t6*1e3:7.2f} ms {nbytes/t6:6.0f} GB/s")


if __name__ == "__main__":
    main()
