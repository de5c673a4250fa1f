"""Bisect the in-kernel-padding slowdown: which part of the new
_stripe_load is slow on real hardware — the windowed (strided) DMA, the
halo memsets, or the pl.when branching?

Variants (all same math except 3/4 which skip halo zeroing — timing only):
  legacy   : jnp.pad in HBM + full-stripe contiguous DMA (round-2 shipped)
  inkpad   : current product path (memsets + 3-branch windowed DMA)
  nomemset : windowed DMA only (halo garbage — timing only)
  nobranch : middle-branch DMA for every tile (wrong edges — timing only)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_inkpad.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, o_ref, xs_ref, sem, *, h_t, kh, kw, ow, co,
            variant, py0, py1, dst_col, wd, n_tiles, xoff):
    import jax.lax as lax

    bb = pl.program_id(0)
    ih = pl.program_id(1)
    stripe = h_t + kh - 1
    wpi = xs_ref.shape[1]

    if variant == "legacy":
        cp = pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ih * h_t, stripe)], xs_ref, sem)
        cp.start()
        cp.wait()
    else:
        if variant != "nomemset":
            if dst_col:
                xs_ref[:, :dst_col, :] = jnp.zeros(
                    (stripe, dst_col, xs_ref.shape[2]), xs_ref.dtype)
            if wpi > dst_col + wd:
                xs_ref[:, dst_col + wd:, :] = jnp.zeros(
                    (stripe, wpi - dst_col - wd, xs_ref.shape[2]),
                    xs_ref.dtype)

        def copy(src_row, dst_row, rows):
            cp = pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(src_row, rows)],
                xs_ref.at[pl.ds(dst_row, rows), pl.ds(dst_col, wd)], sem)
            cp.start()
            cp.wait()

        if variant == "nobranch":
            start = jnp.maximum(ih * h_t - py0, 0)
            start = jnp.minimum(start, xs_ref.shape[0])
            cp = pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(jnp.minimum(ih * h_t, 256 - stripe),
                                   stripe)],
                xs_ref.at[:, pl.ds(dst_col, wd)], sem)
            cp.start()
            cp.wait()
        else:
            @pl.when(ih == 0)
            def _first():
                if py0:
                    xs_ref[:py0, :, :] = jnp.zeros(
                        (py0, wpi, xs_ref.shape[2]), xs_ref.dtype)
                copy(0, py0, stripe - py0)

            @pl.when(ih == n_tiles - 1)
            def _last():
                if py1:
                    xs_ref[stripe - py1:, :, :] = jnp.zeros(
                        (py1, wpi, xs_ref.shape[2]), xs_ref.dtype)
                copy((n_tiles - 1) * h_t - py0, 0, stripe - py1)

            @pl.when(jnp.logical_and(ih > 0, ih < n_tiles - 1))
            def _mid():
                copy(ih * h_t - py0, 0, stripe)

    acc = jnp.zeros((h_t, ow, co), jnp.float32)
    for ty in range(kh):
        for tx in range(kw):
            win = xs_ref[ty:ty + h_t, xoff + tx:xoff + tx + ow, :]
            acc = acc + lax.dot_general(
                win, w_ref[ty, tx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def run(x, w, variant, h_t=16):
    b, h, wd, ci = x.shape
    kh, kw, _, co = w.shape
    py0 = py1 = px0 = px1 = 1
    oh, ow = h, wd
    itemsize = x.dtype.itemsize
    sub_min = 32 // itemsize
    if variant == "legacy":
        xoff, dst_col = 0, px0
        wpi = wd + px0 + px1 + ((-(wd + px0 + px1)) % sub_min)
        xin = jnp.pad(x, ((0, 0), (py0, py1), (px0, wpi - wd - px0), (0, 0)))
    else:
        xoff = (-px0) % sub_min
        dst_col = px0 + xoff
        need = dst_col + wd + px1
        wpi = need + ((-need) % sub_min)
        xin = x
    return pl.pallas_call(
        functools.partial(_kernel, h_t=h_t, kh=kh, kw=kw, ow=ow, co=co,
                          variant=variant, py0=py0, py1=py1, dst_col=dst_col,
                          wd=wd, n_tiles=oh // h_t, xoff=xoff),
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
    )(xin, w.astype(x.dtype))


def main():
    from vspbfr_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    k = jax.random.key(0)
    dt = jnp.bfloat16
    x = jax.random.normal(k, (4, 256, 256, 256), dt)
    w = jax.random.normal(k, (3, 3, 256, 256), dt) * 0.05

    def t(fn, n=30):
        fn().block_until_ready()
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        float(np.asarray(jnp.sum(out)))
        return (time.perf_counter() - t0) / n * 1e3

    ref = None
    for variant in ("legacy", "inkpad", "nomemset", "nobranch"):
        f = jax.jit(functools.partial(run, variant=variant))
        out = f(x, w)
        if variant == "legacy":
            ref = out
        err = (float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                     - ref.astype(jnp.float32))))
               if ref is not None else float("nan"))
        print(f"{variant:9s}: {t(lambda: f(x, w)):7.3f} ms  "
              f"(vs legacy err {err:.3e})", flush=True)


if __name__ == "__main__":
    main()
