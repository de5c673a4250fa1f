"""TPU microbenchmark: packed-layout conv forms vs the current unpacked ops
at the pipeline's hot shapes. Decides where packed mode pays off."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from vspbfr_tpu.ops.modulated_conv import (
    conv2d,
    conv_transpose2d,
    fused_blur_strided_conv,
)
from vspbfr_tpu.ops.packed import (
    blur_down_conv_packed,
    conv2d_packed,
    space_to_depth,
    up_conv_blur_packed,
)
from vspbfr_tpu.ops.upfirdn2d import blur as fir_blur

TAPS = (1, 3, 3, 1)


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


def report(name, t, flops=0):
    msg = f"{name:52s} {t*1e3:8.3f} ms"
    if flops:
        msg += f"  {flops/t/1e12:6.1f} TF/s(eff)"
    print(msg)


def up_blur_ref(x, w, taps):
    k, lk, factor = w.shape[0], len(taps), 2
    out = conv_transpose2d(x, w, stride=2, padding=0)
    p = (lk - factor) - (k - 1)
    return fir_blur(out, taps, pad=((p + 1) // 2 + 1, p // 2 + 1),
                    upsample_factor=factor)


def main():
    key = jax.random.key(0)
    b = 4

    # (res, cin, cout) hot shapes: 512-res C=64, 1024-res C=32
    for (r, c, co) in [(512, 64, 64), (1024, 32, 32), (512, 128, 64)]:
        for dt in (jnp.float32, jnp.bfloat16):
            tag = "bf16" if dt == jnp.bfloat16 else "f32 "
            x = jax.random.normal(key, (b, r, r, c)).astype(dt)
            xp = space_to_depth(x)
            w = (jax.random.normal(key, (3, 3, c, co)) * 0.1).astype(dt)
            flops = 2 * b * r * r * 9 * c * co

            f_u = jax.jit(lambda x, w: conv2d(x, w, padding=1))
            report(f"s1 {r}^2 {c}->{co} {tag} unpacked",
                   timeit(lambda i: f_u(x, w)), flops)
            f_p = jax.jit(lambda xp, w: conv2d_packed(xp, w))
            report(f"s1 {r}^2 {c}->{co} {tag} packed-dense",
                   timeit(lambda i: f_p(xp, w)), flops)

            for dil in (2, 8):
                pad = dil
                f_ud = jax.jit(lambda x, w, d=dil: conv2d(x, w, padding=d,
                                                          dilation=d))
                report(f"d{dil} {r}^2 {c}->{co} {tag} unpacked",
                       timeit(lambda i: f_ud(x, w)), flops)
                f_pg = jax.jit(lambda xp, w, d=dil: conv2d_packed(
                    xp, w, dilation=d, groups_hint=True))
                report(f"d{dil} {r}^2 {c}->{co} {tag} packed-group",
                       timeit(lambda i: f_pg(xp, w)), flops)
                f_pd = jax.jit(lambda xp, w, d=dil: conv2d_packed(
                    xp, w, dilation=d, groups_hint=False))
                report(f"d{dil} {r}^2 {c}->{co} {tag} packed-dense",
                       timeit(lambda i: f_pd(xp, w)), flops)

            # up path: input at r/2 feeding res r
            xi = jax.random.normal(key, (b, r // 2, r // 2, 2 * c)).astype(dt)
            xip = space_to_depth(xi)
            wu = (jax.random.normal(key, (3, 3, 2 * c, co)) * 0.1).astype(dt)
            fu_ref = jax.jit(lambda x, w: up_blur_ref(x, w, TAPS))
            report(f"up {r//2}->{r} {2*c}->{co} {tag} convT+blur",
                   timeit(lambda i: fu_ref(xi, wu)),
                   2 * b * r * r * 9 * 2 * c * co)
            fu_pk = jax.jit(lambda x, w: up_conv_blur_packed(
                x, w, TAPS, packed_in=False))
            report(f"up {r//2}->{r} {2*c}->{co} {tag} packed(unp-in)",
                   timeit(lambda i: fu_pk(xi, wu)),
                   2 * b * r * r * 9 * 2 * c * co)
            fu_pp = jax.jit(lambda x, w: up_conv_blur_packed(
                x, w, TAPS, packed_in=True))
            report(f"up {r//2}->{r} {2*c}->{co} {tag} packed(pk-in)",
                   timeit(lambda i: fu_pp(xip, wu)),
                   2 * b * r * r * 9 * 2 * c * co)

            # down path: res r -> r/2
            wd = (jax.random.normal(key, (3, 3, c, 2 * c)) * 0.1).astype(dt)
            k, lk, factor = 3, len(TAPS), 2
            p = (lk - factor) + (k - 1)
            fd_ref = jax.jit(lambda x, w: fused_blur_strided_conv(
                x, w, TAPS, ((p + 1) // 2, p // 2), stride=2))
            report(f"dn {r}->{r//2} {c}->{2*c} {tag} blur+s2conv",
                   timeit(lambda i: fd_ref(x, wd)),
                   2 * b * (r // 2) ** 2 * 9 * c * 2 * c)
            fd_pk = jax.jit(lambda xp, w: blur_down_conv_packed(xp, w, TAPS))
            report(f"dn {r}->{r//2} {c}->{2*c} {tag} packed-in",
                   timeit(lambda i: fd_pk(xp, wd)),
                   2 * b * (r // 2) ** 2 * 9 * c * 2 * c)
            print()


if __name__ == "__main__":
    main()
