"""Decision experiment: semi-packed (width-only) layout vs packed at C=64.

The RestoreNet/Generator 512px resolutions (C=64) run 2x2-packed today;
their dense fusion convs pay 4x FLOP density (ROADMAP round-2 notes). The
width-only layout reaches the same 128-lane width at 2x density. This
script measures, at the product shapes (batch 4, res 512, C=64):

  1. stride-1 dense 3x3 (the SMART fusion-conv shape) in unpacked /
     semi-packed / packed forms,
  2. the even-dilation grouped forms (identical FLOPs by construction —
     sanity check that wall-clock agrees),
  3. the layout-conversion taxes: packed <-> semi-packed and the
     space_to_width reshape (expected ~free: it is a pure reshape).

Verdict rule: semi-packed SMART wiring goes ahead only if (1)'s win exceeds
the per-instance conversion tax under the production composition.

VSPBFR_PROF_DTYPE=bf16 measures the production inference dtype.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from vspbfr_tpu.ops.packed import conv2d_packed, space_to_depth
from vspbfr_tpu.ops.semipacked import (
    conv2d_semipacked,
    packed_to_semipacked,
    semipacked_to_packed,
    space_to_width,
)
from vspbfr_tpu.ops.pallas_conv import conv2d_dense

DTYPE = (jnp.bfloat16 if os.environ.get("VSPBFR_PROF_DTYPE") == "bf16"
         else jnp.float32)


def flush(x):
    # over the axon tunnel block_until_ready does not actually block;
    # force completion by reading back a scalar reduction
    return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32))))


def timeit(fn, n=30):
    def run(k):
        out = None
        t0 = time.perf_counter()
        for i in range(k):
            out = fn(i)
        flush(out)
        return time.perf_counter() - t0
    run(2)  # warmup/compile
    return (run(2 + n) - run(2)) / n


def tf_s(flops, dt):
    return flops / dt / 1e12


def main(b=4, res=512, c=64, k=3):
    key = jax.random.key(0)
    x = jax.random.normal(key, (b, res, res, c), DTYPE)
    w = jax.random.normal(key, (k, k, c, c), DTYPE) * 0.1
    xp = space_to_depth(x)        # (b, res/2, res/2, 4c)
    xs = space_to_width(x)        # (b, res, res/2, 2c)
    ideal = 2 * b * res * res * k * k * c * c

    print(f"dtype={DTYPE.__name__}  shapes: unpacked {x.shape} "
          f"semi {xs.shape} packed {xp.shape}  ideal {ideal/1e9:.1f} GFLOP")

    # -- 1. stride-1 dense 3x3 ------------------------------------------
    p = (k - 1) // 2
    f_un = jax.jit(lambda x, w: conv2d_dense(x, w, ((p, p), (p, p))))
    f_sp = jax.jit(lambda x, w: conv2d_semipacked(x, w))
    f_pk = jax.jit(lambda x, w: conv2d_packed(x, w))
    t_un = timeit(lambda i: f_un(x, w))
    t_sp = timeit(lambda i: f_sp(xs, w))
    t_pk = timeit(lambda i: f_pk(xp, w))
    print(f"dense 3x3:  unpacked {t_un*1e3:6.2f} ms ({tf_s(ideal,t_un):5.1f}"
          f" TF/s ideal-rate)   semi {t_sp*1e3:6.2f} ms   "
          f"packed {t_pk*1e3:6.2f} ms")

    # -- 2. even dilations (grouped forms) ------------------------------
    for d in (2, 4, 8):
        g_sp = jax.jit(lambda x, w: conv2d_semipacked(x, w, dilation=d))
        g_pk = jax.jit(lambda x, w: conv2d_packed(x, w, dilation=d))
        td_sp = timeit(lambda i: g_sp(xs, w))
        td_pk = timeit(lambda i: g_pk(xp, w))
        print(f"dil {d} grouped:  semi {td_sp*1e3:6.2f} ms   "
              f"packed {td_pk*1e3:6.2f} ms")

    # -- 3. conversion taxes --------------------------------------------
    c_ps = jax.jit(packed_to_semipacked)
    c_sp = jax.jit(semipacked_to_packed)
    c_w = jax.jit(space_to_width)
    t_ps = timeit(lambda i: c_ps(xp))
    t_sp2 = timeit(lambda i: c_sp(xs))
    t_w = timeit(lambda i: c_w(x))
    nbytes = np.prod(x.shape) * x.dtype.itemsize
    print(f"convert: packed->semi {t_ps*1e3:6.3f} ms "
          f"({2*nbytes/t_ps/1e9:5.0f} GB/s)   semi->packed "
          f"{t_sp2*1e3:6.3f} ms   s2w(reshape) {t_w*1e3:6.3f} ms")

    # -- verdict ---------------------------------------------------------
    inst_win = t_pk - t_sp
    tax = t_ps + t_sp2
    print(f"\nper-fusion-conv win {inst_win*1e3:+.2f} ms; boundary "
          f"conversion tax {tax*1e3:.2f} ms per round-trip")
    print("verdict:", "WIRE IT (win > tax even per single conv)"
          if inst_win > tax else
          "wire only if several convs share one conversion"
          if inst_win > 0 else "REJECT (no per-conv win)")


if __name__ == "__main__":
    main()
