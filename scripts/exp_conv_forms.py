"""Measure achievable throughput for the hot conv shapes in different
formulations (direct NHWC conv, channel-padded, im2col-matmul, bf16) plus
bandwidth/FLOP roofline references.

Queue-then-flush timing (block_until_ready does not block on the tunneled
axon platform; see profile_stages.py)."""

import time

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


def report(name, t, flops=0, bytes_=0):
    msg = f"{name:44s} {t*1e3:8.3f} ms"
    if flops:
        msg += f"  {flops/t/1e12:6.1f} TF/s"
    if bytes_:
        msg += f"  {bytes_/t/1e9:6.1f} GB/s"
    print(msg)


def main():
    key = jax.random.key(0)

    # rooflines
    a = jax.random.normal(key, (8192, 8192)).astype(jnp.bfloat16)
    mm = jax.jit(lambda a: a @ a)
    report("matmul 8k^2 bf16 (peak MXU)", timeit(lambda i, a=a: mm(a)),
           flops=2 * 8192**3)
    a32 = a.astype(jnp.float32)
    report("matmul 8k^2 f32", timeit(lambda i: mm(a32)), flops=2 * 8192**3)
    big = jax.random.normal(key, (4, 1024, 1024, 64), jnp.float32)
    cp = jax.jit(lambda x: x * 1.5 + 1.0)
    report("elementwise 1GB f32 (peak BW)", timeit(lambda i: cp(big)),
           bytes_=2 * big.size * 4)
    del a, a32, big

    for (b, r, c, cout) in [(4, 512, 64, 64), (4, 1024, 32, 32),
                            (4, 256, 128, 128), (4, 512, 128, 128),
                            (4, 256, 512, 512)]:
        for dt in (jnp.float32, jnp.bfloat16):
            x = jax.random.normal(key, (b, r, r, c)).astype(dt)
            w = (jax.random.normal(key, (3, 3, c, cout)) * 0.05).astype(dt)
            flops = 2 * b * r * r * 9 * c * cout
            bytes_ = (x.size + b * r * r * cout) * x.dtype.itemsize
            tag = "bf16" if dt == jnp.bfloat16 else "f32 "

            conv = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
            report(f"conv3x3 {r}^2 {c}->{cout} {tag} direct",
                   timeit(lambda i: conv(x, w)), flops, bytes_)

            if cout < 128:
                wp = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, 128 - cout)))
                convp = jax.jit(lambda x, wp: jax.lax.conv_general_dilated(
                    x, wp, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., :cout])
                report(f"conv3x3 {r}^2 {c}->{cout} {tag} padout128",
                       timeit(lambda i: convp(x, wp)), flops, bytes_)

            # im2col: shifted slices folded into one matmul over taps
            def im2col(x, w):
                xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
                cols = [xp[:, i:i + r, j:j + r, :] for i in range(3)
                        for j in range(3)]
                patches = jnp.concatenate(cols, axis=-1)  # (b,r,r,9c)
                return patches @ w.reshape(9 * c, cout)

            im = jax.jit(im2col)
            if dt == jnp.float32:
                err = float(jnp.max(jnp.abs(conv(x, w) - im(x, w))))
                assert err < 1e-2, err
            report(f"conv3x3 {r}^2 {c}->{cout} {tag} im2col-mm",
                   timeit(lambda i: im(x, w)), flops, bytes_)
            del x, w
        print()


if __name__ == "__main__":
    main()
