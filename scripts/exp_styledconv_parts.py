"""Decompose the packed 512->1024 StyledConv-up chain on TPU: which part
eats the time? (conv / interleave / style mult / demod / noise+lrelu)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from vspbfr_tpu.ops import fused_leaky_relu
from vspbfr_tpu.ops.modulated_conv import demod_coeffs, modulated_conv2d
from vspbfr_tpu.ops.packed import pack_vector, up_conv_blur_packed


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
    key = jax.random.key(0)
    b, hg, ci, co = 4, 256, 64, 32
    x = jax.random.normal(key, (b, hg, hg, 4 * ci))          # packed 512-res
    w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, ci, co)) * 0.1
    sty = jax.random.normal(jax.random.fold_in(key, 2), (b, ci)) * 0.1 + 1.0
    taps = (1, 3, 3, 1)
    scale = 1.0 / (ci * 9) ** 0.5
    noise = jax.random.normal(jax.random.fold_in(key, 3),
                              (b, 2 * hg, 2 * hg, 4))
    bias = jnp.zeros((co,))
    y = jax.random.normal(key, (b, 2 * hg, 2 * hg, 4 * co))

    def bench(name, fn, *args):
        f = jax.jit(fn)
        f(*args)
        print(f"{name:44s} {1e3 * timeit(lambda i: f(*args)):7.2f} ms")

    bench("conv16+interleave (up_conv_blur_packed)",
          lambda x, w: up_conv_blur_packed(x, scale * w, taps, packed_in=True),
          x, w)

    bench("+ style mult",
          lambda x, w, s: up_conv_blur_packed(
              x * pack_vector(s)[:, None, None, :], scale * w, taps,
              packed_in=True),
          x, w, sty)

    def with_demod(x, w, s):
        xs = x * pack_vector(s)[:, None, None, :]
        out = up_conv_blur_packed(xs, scale * w, taps, packed_in=True)
        d = demod_coeffs(w, s, scale)
        return out * pack_vector(d)[:, None, None, :]
    bench("+ demod", with_demod, x, w, sty)

    bench("modulated_conv2d(up, packed)",
          lambda x, w, s: modulated_conv2d(x, w, s, up=True, blur_kernel=taps,
                                           packed_in=True, packed_out=True),
          x, w, sty)

    def full_styled(x, w, s, nz, bb_):
        out = modulated_conv2d(x, w, s, up=True, blur_kernel=taps,
                               packed_in=True, packed_out=True)
        out = out + 0.1 * jnp.repeat(nz, co, axis=-1)
        return fused_leaky_relu(out, pack_vector(bb_))
    bench("+ noise + lrelu (full StyledConv math)", full_styled,
          x, w, sty, noise, bias)

    bench("noise repeat+add alone (1024 packed)",
          lambda y, nz: y + 0.1 * jnp.repeat(nz, co, axis=-1), y, noise)

    bench("fused lrelu alone (1024 packed)",
          lambda y, bb_: fused_leaky_relu(y, pack_vector(bb_)), y, bias)


if __name__ == "__main__":
    main()
