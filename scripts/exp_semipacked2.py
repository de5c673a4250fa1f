"""Decision experiment 2: semi-packed vs packed at the ACTUAL SMART shapes.

exp_semipacked.py measured C->C proxies; the model's 512-res SMART layer
(batch 4, C=64) is: merged d1+d2 (64->32), densified block-diagonal d4 and
d8 (64->16 each, rhs_dilation 2/4 on the packed grid), and the dense 3x3
fusion conv (64->64). This measures each at model shapes in both layouts,
plus the sum, to predict the per-SMART win of a semi-packed 512 region.

VSPBFR_PROF_DTYPE=bf16 measures the production inference dtype.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from vspbfr_tpu.ops.modulated_conv import modulated_conv2d_d12_packed
from vspbfr_tpu.ops.packed import conv2d_packed, space_to_depth
from vspbfr_tpu.ops.semipacked import conv2d_semipacked, space_to_width

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


def main(b=4, res=512, c=64):
    key = jax.random.key(0)
    x = jax.random.normal(key, (b, res, res, c), DTYPE)
    xp = space_to_depth(x)
    xs = space_to_width(x)
    print(f"dtype={DTYPE.__name__}  semi {xs.shape} packed {xp.shape}")

    cases = [
        ("fusion 3x3 64->64 d1", c, 1),
        ("branch   64->16 d4  ", c // 4, 4),
        ("branch   64->16 d8  ", c // 4, 8),
        ("branch   64->16 d1  ", c // 4, 1),
        ("branch   64->16 d2  ", c // 4, 2),
    ]
    times = {}
    for name, co, d in cases:
        w = jax.random.normal(key, (3, 3, c, co), DTYPE) * 0.1
        f_s = jax.jit(lambda x, w, d=d: conv2d_semipacked(
            x, w, dilation=d, groups_hint=False))
        f_p = jax.jit(lambda x, w, d=d: conv2d_packed(
            x, w, dilation=d, groups_hint=False))
        ts = timeit(lambda i: f_s(xs, w))
        tp = timeit(lambda i: f_p(xp, w))
        times[name.strip()] = (ts, tp)
        print(f"{name}: semi {ts*1e3:6.2f} ms   packed {tp*1e3:6.2f} ms")

    # the packed pipeline's actual d1+d2 path: ONE merged modulated conv
    w1 = jax.random.normal(key, (3, 3, c, c // 4), DTYPE) * 0.1
    w2 = jax.random.normal(key, (3, 3, c, c // 4), DTYPE) * 0.1
    sty = jnp.ones((b, c), DTYPE)
    f_m = jax.jit(lambda x, w1, w2, s: modulated_conv2d_d12_packed(
        x, w1, w2, s, demodulate=True))
    tm = timeit(lambda i: f_m(xp, w1, w2, sty))
    print(f"packed d1+d2 MERGED (modulated):      {tm*1e3:6.2f} ms")

    t = {k: v for k, v in times.items()}
    smart_p = (t["fusion 3x3 64->64 d1"][1] + tm
               + t["branch   64->16 d4"][1] + t["branch   64->16 d8"][1])
    smart_s = (t["fusion 3x3 64->64 d1"][0]
               + t["branch   64->16 d1"][0] + t["branch   64->16 d2"][0]
               + t["branch   64->16 d4"][0] + t["branch   64->16 d8"][0])
    print(f"\nSMART-composition: semi {smart_s*1e3:.2f} ms  packed"
          f" {smart_p*1e3:.2f} ms  win {(smart_p-smart_s)*1e3:+.2f}"
          f" ms/instance (x4 instances at 512-res per restore+encode pass)")


if __name__ == "__main__":
    main()
