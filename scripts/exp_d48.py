"""Decision experiment: Pallas d4|d8 pair kernel vs current branch lowering.

SMART's dilation-4/8 branches at model shapes (batch 4):
  * 512-res packed:   x (4,256,256,256), grouped (4 phases), half-grid
                      dilations (2,4), Co=16/branch -> 128 out lanes
  * 256-res unpacked: x (4,256,256,128), dense, dilations (4,8),
                      Co=32/branch -> 64 out lanes

Current lowering = what conv2d_packed/conv2d emit today (dense block-diag
XLA conv at rhs_dilation for packed; plain XLA dilated conv unpacked).

VSPBFR_PROF_DTYPE=bf16 measures the production inference dtype.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from vspbfr_tpu.ops.packed import conv2d_packed
from vspbfr_tpu.ops.modulated_conv import conv2d
from vspbfr_tpu.ops.pallas_dilated import dilated_pair_conv

DTYPE = (jnp.bfloat16 if os.environ.get("VSPBFR_PROF_DTYPE") == "bf16"
         else jnp.float32)


def flush(x):
    return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32))))


def timeit(fn, n=30):
    def run(k):
        out = None
        t0 = time.perf_counter()
        for i in range(k):
            out = fn(i)
        flush(out)
        return time.perf_counter() - t0
    run(2)
    return (run(2 + n) - run(2)) / n


def bench_case(name, x, cur_fn, pair_fn, useful_gflop):
    cur = jax.jit(cur_fn)
    pair = jax.jit(pair_fn)
    err = float(jnp.max(jnp.abs(cur(x).astype(jnp.float32)
                                - pair(x).astype(jnp.float32))))
    t_cur = timeit(lambda i: cur(x))
    t_pair = timeit(lambda i: pair(x))
    print(f"{name}: cur {t_cur*1e3:7.3f} ms ({useful_gflop/t_cur/1e3:5.1f} "
          f"TF/s)  pair {t_pair*1e3:7.3f} ms "
          f"({useful_gflop/t_pair/1e3:5.1f} TF/s)  "
          f"{t_cur/t_pair:4.2f}x  maxerr {err:.2e}")


def main():
    key = jax.random.key(0)
    b = 4

    # --- 512-res packed: grouped, half-grid dilations (2, 4) ---
    ci, cb = 64, 16
    x = jax.random.normal(key, (b, 256, 256, 4 * ci), DTYPE)
    w4 = (jax.random.normal(jax.random.key(1), (3, 3, ci, cb)) * 0.1).astype(DTYPE)
    w8 = (jax.random.normal(jax.random.key(2), (3, 3, ci, cb)) * 0.1).astype(DTYPE)
    isc = (jax.random.normal(jax.random.key(3), (b, 4 * ci)) * 0.3 + 1.0
           ).astype(DTYPE)

    def cur_packed(x):
        o4 = conv2d_packed(x, w4, dilation=4, groups_hint=False, in_scale=isc)
        o8 = conv2d_packed(x, w8, dilation=8, groups_hint=False, in_scale=isc)
        return jnp.concatenate([o4, o8], axis=-1)

    def pair_packed(x):
        return dilated_pair_conv(x, w4, w8, 2, 4, groups=4, in_scale=isc)

    gflop = 2 * b * 256 * 256 * 2 * 9 * ci * cb * 4 / 1e9
    bench_case("512 packed  d4|d8", x, cur_packed, pair_packed, gflop)

    # --- 256-res unpacked: dense, dilations (4, 8) ---
    ci2, cb2 = 128, 32
    x2 = jax.random.normal(key, (b, 256, 256, ci2), DTYPE)
    wa = (jax.random.normal(jax.random.key(4), (3, 3, ci2, cb2)) * 0.1).astype(DTYPE)
    wb = (jax.random.normal(jax.random.key(5), (3, 3, ci2, cb2)) * 0.1).astype(DTYPE)
    isc2 = (jax.random.normal(jax.random.key(6), (b, ci2)) * 0.3 + 1.0
            ).astype(DTYPE)

    def cur_unpacked(x):
        xs = x * isc2[:, None, None, :]
        oa = conv2d(xs, wa, padding=4, dilation=4)
        ob = conv2d(xs, wb, padding=8, dilation=8)
        return jnp.concatenate([oa, ob], axis=-1)

    def pair_unpacked(x):
        return dilated_pair_conv(x, wa, wb, 4, 8, groups=1, in_scale=isc2)

    gflop2 = 2 * b * 256 * 256 * 2 * 9 * ci2 * cb2 / 1e9
    bench_case("256 unpacked d4|d8", x2, cur_unpacked, pair_unpacked, gflop2)

    # --- 128-res unpacked (encoder path also hits this) ---
    x3 = jax.random.normal(key, (b, 128, 128, 256), DTYPE)
    wc = (jax.random.normal(jax.random.key(7), (3, 3, 256, 64)) * 0.1).astype(DTYPE)
    wd = (jax.random.normal(jax.random.key(8), (3, 3, 256, 64)) * 0.1).astype(DTYPE)

    def cur_128(x):
        oa = conv2d(x, wc, padding=4, dilation=4)
        ob = conv2d(x, wd, padding=8, dilation=8)
        return jnp.concatenate([oa, ob], axis=-1)

    def pair_128(x):
        return dilated_pair_conv(x, wc, wd, 4, 8, groups=1)

    gflop3 = 2 * b * 128 * 128 * 2 * 9 * 256 * 64 / 1e9
    bench_case("128 unpacked d4|d8", x3, cur_128, pair_128, gflop3)

    # --- full 4-branch unpacked merge (the 256-res SMART branch set) ---
    from vspbfr_tpu.ops.pallas_dilated import dilated_multi_conv
    from vspbfr_tpu.ops.pallas_conv import conv2d_dense
    w1 = (jax.random.normal(jax.random.key(9), (3, 3, ci2, cb2)) * 0.1).astype(DTYPE)
    w2 = (jax.random.normal(jax.random.key(10), (3, 3, ci2, cb2)) * 0.1).astype(DTYPE)

    def cur_multi(x):
        o1 = conv2d_dense(x, w1, ((1, 1), (1, 1)), in_scale=isc2)
        xs = x * isc2[:, None, None, :]
        o2 = conv2d(xs, w2, padding=2, dilation=2)
        oa_ = conv2d(xs, wa, padding=4, dilation=4)
        ob_ = conv2d(xs, wb, padding=8, dilation=8)
        return jnp.concatenate([o1, o2, oa_, ob_], axis=-1)

    def multi_fn(x):
        return dilated_multi_conv(x2, (w1, w2, wa, wb), (1, 2, 4, 8),
                                  in_scale=isc2)

    gflop4 = 2 * gflop2
    bench_case("256 unpacked d1|d2|d4|d8", x2, cur_multi, multi_fn, gflop4)


if __name__ == "__main__":
    print(f"dtype={DTYPE.__name__} backend={jax.default_backend()}")
    main()
