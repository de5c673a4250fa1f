"""Measure where the ADA augment chain's time goes (fwd vs bwd, warp vs rest).

Round-5 follow-up to the convergence-run finding that augment adds ~1 s/step
at 256px b8 (`restoration_train` with --augment): isolate grid_sample_bilinear
fwd / fwd+bwd and the full augment chain fwd / fwd+bwd on the real chip so the
fix targets the measured dominator (reference chain: `non_leaking.py:857-934`).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_warp.py
"""
import time
import json

import jax
import jax.numpy as jnp
import numpy as np

from vspbfr_tpu.losses import ada


def _sync(x):
    """Force completion via host readback: over the axon tunnel,
    `block_until_ready` can return before the computation drains (measured a
    26 MB copy at an impossible 1.9 TB/s with it), so every timing here reads
    a scalar back like bench.py does."""
    return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0])))


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    key = jax.random.PRNGKey(0)
    res = {}
    for size, batch in ((256, 8), (512, 4)):
        img = jax.random.normal(key, (batch, size, size, 3), jnp.float32)
        p = jnp.float32(0.5)

        aug = jax.jit(lambda k, im: ada.augment(k, im, p))
        aug_g = jax.jit(jax.grad(lambda im, k: jnp.sum(ada.augment(k, im, p))))

        # isolate the warp: same grid bookkeeping as apply_affine's interior
        G = ada.sample_affine(key, p, batch, size, size)
        bk, h, w, c = img.shape

        def warp_only(im, Gm):
            return ada.apply_affine(im, Gm)

        warp = jax.jit(warp_only)
        warp_g = jax.jit(jax.grad(lambda im, Gm: jnp.sum(warp_only(im, Gm))))

        # the raw grid_sample on the 2x-padded shape it really sees
        h2 = (size + 6) * 2
        img2 = jax.random.normal(key, (batch, h2, h2, 3), jnp.float32)
        grid = jax.random.uniform(key, (batch, h2, h2, 2), minval=-1, maxval=1)
        gs = jax.jit(ada.grid_sample_bilinear)
        gs_g = jax.jit(jax.grad(lambda im, g: jnp.sum(ada.grid_sample_bilinear(im, g))))

        row = {}
        for name, fn, a in (
            ("gridsample_fwd_ms", gs, (img2, grid)),
            ("gridsample_fwdbwd_ms", gs_g, (img2, grid)),
            ("affine_fwd_ms", warp, (img, G)),
            ("affine_fwdbwd_ms", warp_g, (img, G)),
            ("augment_fwd_ms", aug, (key, img)),
            ("augment_fwdbwd_ms", aug_g, (img, key)),
        ):
            row[name] = round(timeit(fn, *a, n=5, warmup=2), 2)
            print(size, name, row[name], flush=True)
        res[f"{size}px_b{batch}"] = row
    print(json.dumps(res))


if __name__ == "__main__":
    main()
