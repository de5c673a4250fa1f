"""Round-2 ablation: packed_min_res depth x compute dtype for the two hot
stages (decode, restore) at the production config (b4, 512px, 1024 decoder).
Queue-then-flush timing (see profile_stages.py)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from vspbfr_tpu.pipeline import RestorationPipeline


def flush(x):
    return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32))))


def timeit(fn, n=10):
    def run(k):
        out = None
        t0 = time.perf_counter()
        for i in range(k):
            out = fn(i)
        flush(out)
        return time.perf_counter() - t0

    run(1)
    return (run(2 + n) - run(2)) / n


def main(batch=4, size=512, dec=1024):
    for dtype, tag in ((None, "f32"), (jnp.bfloat16, "bf16")):
        for pmr in (512, 256, 128):
            pipe = RestorationPipeline(size=size, decoder_size=dec,
                                       compute_dtype=dtype,
                                       packed_min_res=pmr)
            params = jax.jit(pipe.init_params)(jax.random.key(0))
            low = jax.random.uniform(jax.random.key(1),
                                     (batch, size, size, 3),
                                     minval=-1.0, maxval=1.0)
            if dtype is not None:
                params = pipe._cast(params)
                low = low.astype(dtype)

            dec_fn = jax.jit(lambda p, w, k: pipe.psp.decode_with_feats(
                p["psp"], w, noise_rng=k))

            def gen_fn(p, x, feats, lat, k):
                k1, k2 = jax.random.split(k)
                nl = pipe.sample_mixing_latent(p["generator"], k1, x.shape[0])
                return pipe.generator.apply(
                    {"params": p["generator"]}, x, feats, lat, nl,
                    input_is_latent=True, deterministic=True,
                    rngs={"noise": k2})

            gen = jax.jit(gen_fn)
            lat = jnp.zeros((batch, 18, 512),
                            dtype or jnp.float32) + 0.1
            img, feats = dec_fn(params, lat, jax.random.key(3))
            flush(gen(params, low, feats, lat, jax.random.key(4)))

            t_dec = timeit(lambda i: dec_fn(params, lat, jax.random.key(i))[0])
            t_gen = timeit(lambda i: gen(params, low, feats, lat,
                                         jax.random.key(i)))
            print(f"[{tag} pmr={pmr:4d}] decode {1e3 * t_dec:7.1f} ms   "
                  f"restore {1e3 * t_gen:7.1f} ms")


if __name__ == "__main__":
    main()
