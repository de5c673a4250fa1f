"""Prototype + TPU benchmark: Pallas dense stride-1 conv for packed-layout
tensors (kp x kp kernel as per-tap MXU dots on a VMEM-resident row tile)
vs jax.lax.conv_general_dilated, at the decoder's hot shapes."""

import functools
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


def conv_pallas(x, w, py0, py1, px0, px1):
    """x (B,H,W,Ci), w (kh,kw,Ci,Co), stride 1, explicit pads."""
    import jax.lax as lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, wd, ci = x.shape
    kh, kw, _, co = w.shape
    oh = h + py0 + py1 - kh + 1
    ow = wd + px0 + px1 - kw + 1
    wx_extra = (-(wd + px0 + px1)) % 8
    xpad = jnp.pad(x, ((0, 0), (py0, py1), (px0, px1 + wx_extra), (0, 0)))
    wpi = wd + px0 + px1 + wx_extra

    itemsize = x.dtype.itemsize
    budget = 9 * 1024 * 1024
    h_t = 1
    for cand in (32, 16, 8, 4, 2, 1):
        if oh % cand:
            continue
        need = ((cand + kh - 1) * wpi * ci + 2 * cand * ow * co) * itemsize
        if need < budget:
            h_t = cand
            break

    def kernel(x_hbm, w_ref, o_ref, xs_ref, sem, *, h_t, ow, co):
        bb = pl.program_id(0)
        ih = pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ih * h_t, h_t + kh - 1)], xs_ref, sem)
        cp.start()
        cp.wait()
        acc = jnp.zeros((h_t, ow, co), jnp.float32)
        for ty in range(kh):
            for tx in range(kw):
                win = xs_ref[ty:ty + h_t, tx:tx + ow, :]
                acc = acc + lax.dot_general(
                    win, w_ref[ty, tx],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        o_ref[0] = acc.astype(o_ref.dtype)

    return pl.pallas_call(
        functools.partial(kernel, h_t=h_t, ow=ow, co=co),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, co), x.dtype),
        grid=(b, oh // h_t),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h_t, ow, co),
                               lambda bb, ih: (bb, ih, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h_t + kh - 1, wpi, ci), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(xpad, w.astype(x.dtype))


def main():
    key = jax.random.key(0)
    shapes = [
        ((4, 512, 512, 128), (3, 3, 128, 128), "1024-res conv2 packed"),
        ((4, 256, 256, 256), (3, 3, 256, 256), "512-res conv2 packed"),
        ((4, 256, 256, 256), (2, 2, 256, 512), "512->1024 up16 packed"),
        ((4, 256, 256, 256), (3, 3, 256, 64), "SMART d1 branch packed"),
    ]
    for xs, ws, name in shapes:
        x = jax.random.normal(key, xs)
        w = jax.random.normal(jax.random.fold_in(key, 1), ws) * 0.05
        kh = ws[0]
        p0 = (kh - 1) // 2
        p1 = kh - 1 - p0
        fx = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), ((p0, p1), (p0, p1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        fp = jax.jit(lambda x, w: conv_pallas(x, w, p0, p1, p0, p1))
        ox, op = fx(x, w), fp(x, w)
        err = float(jnp.max(jnp.abs(ox - op))) / float(jnp.std(ox))
        tx = timeit(lambda i: fx(x, w))
        tp = timeit(lambda i: fp(x, w))
        gflop = 2 * np.prod(xs[:3]) * ws[0] * ws[1] * ws[2] * ws[3] / 1e9
        print(f"{name:26s} xla {tx*1e3:6.2f} ms ({gflop/tx/1e3:5.1f} TF/s)  "
              f"pallas {tp*1e3:6.2f} ms ({gflop/tp/1e3:5.1f} TF/s)  "
              f"({tx/tp:4.2f}x)  err/std {err:.1e}")


if __name__ == "__main__":
    main()
