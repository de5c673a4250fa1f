"""Per-stage latency ablation of the restore pipeline on the current device.

Queue-then-flush timing: programs on one TPU core execute sequentially, so
launching n executions and reading back one scalar measures n * stage_time +
one fixed readback; the marginal difference between two run lengths cancels
the readback (block_until_ready does not block on the tunneled platform).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from vspbfr_tpu.pipeline import RestorationPipeline


def flush(x):
    return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0])))


def timeit(fn, n=10):
    def run(k):
        outs = None
        t0 = time.perf_counter()
        for i in range(k):
            outs = fn(i)
        flush(outs)
        return time.perf_counter() - t0

    run(1)  # warm cache
    return (run(2 + n) - run(2)) / n


def main(batch=4, size=512, dec=1024, dtype=None):
    pipe = RestorationPipeline(size=size, decoder_size=dec,
                               compute_dtype=dtype)
    params = jax.jit(pipe.init_params)(jax.random.key(0))
    low = jax.random.uniform(jax.random.key(1), (batch, size, size, 3),
                             minval=-1.0, maxval=1.0)
    if dtype is not None:
        params = pipe._cast(params)
        low = low.astype(dtype)

    enc = jax.jit(lambda p, x: pipe.psp.get_w_plus(p["psp"], x))
    diff = jax.jit(lambda p, w, k: pipe.diffuse_latent(p, w, k))
    dec_fn = jax.jit(
        lambda p, w, k: pipe.psp.decode_with_feats(p["psp"], w, noise_rng=k))

    def gen_fn(p, x, feats, lat, k):
        k1, k2 = jax.random.split(k)
        nl = pipe.sample_mixing_latent(p["generator"], k1, x.shape[0])
        return pipe.generator.apply(
            {"params": p["generator"]}, x, feats, lat, nl,
            input_is_latent=True, deterministic=True, rngs={"noise": k2})

    gen = jax.jit(gen_fn)

    w = enc(params, low)
    lat = diff(params, w, jax.random.key(2))
    img, feats = dec_fn(params, lat, jax.random.key(3))
    flush(gen(params, low, feats, lat, jax.random.key(4)))

    tag = dtype or "f32"
    print(f"[{tag}] encode  {1e3 * timeit(lambda i: enc(params, low)):7.1f} ms")
    print(f"[{tag}] ddpm    {1e3 * timeit(lambda i: diff(params, w, jax.random.key(i))):7.1f} ms")
    print(f"[{tag}] decode  {1e3 * timeit(lambda i: dec_fn(params, lat, jax.random.key(i))[0]):7.1f} ms")
    print(f"[{tag}] restore {1e3 * timeit(lambda i: gen(params, low, feats, lat, jax.random.key(i))):7.1f} ms")


if __name__ == "__main__":
    import sys
    dtype = jnp.bfloat16 if "--bf16" in sys.argv else None
    main(dtype=dtype)
