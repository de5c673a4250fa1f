"""RNG cost in the inference pipeline: threefry (JAX default) vs rbg.

The round-4 decode audit (exp_decode_r4.py) measured ~0.9-1.0 ms per
standalone NoiseInjection draw at the 512-res shapes; the pipeline draws
~30 noise fields per call (decode ladder + RestoreNet styled convs). JAX's
default threefry2x32 computes the stream on the VPU; 'rbg' uses the TPU's
hardware RNG instruction. Both give iid normals — the stream differs, so
rbg is a serving-path option (parity tests pass explicit noise or compare
within one impl).

Measures: (1) a single normal draw at the dominant shape under both impls,
(2) the full b4 bf16 e2e restore under both.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_rng.py
"""

import time

import numpy as np


def flush(x):
    import jax.numpy as jnp
    import jax
    return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0]
                                    .astype(jnp.float32))))


def timeit(fn, n=20):
    def run(k):
        out = None
        t0 = time.perf_counter()
        for i in range(k):
            out = fn(i)
        flush(out)
        return time.perf_counter() - t0

    run(2)
    return (run(2 + n) - run(2)) / n


def main():
    import jax
    import jax.numpy as jnp
    from vspbfr_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    for impl in ("threefry2x32", "rbg"):
        jax.config.update("jax_default_prng_impl", impl)

        # draw cost at the dominant packed shape (4, 256, 256, 4)
        f = jax.jit(lambda k: jax.random.normal(
            k, (4, 256, 256, 4)).astype(jnp.bfloat16))
        t_draw = timeit(lambda i: f(jax.random.key(i)), n=30)

        # e2e restore b4 (fresh pipeline per impl: key types differ)
        from vspbfr_tpu.pipeline import RestorationPipeline
        pipe = RestorationPipeline(size=512, decoder_size=1024,
                                   compute_dtype=jnp.bfloat16)
        params = jax.jit(pipe.init_params)(jax.random.key(0))
        pp = pipe.prepare_params(params)
        low = jax.random.uniform(jax.random.key(1), (4, 512, 512, 3),
                                 minval=-1.0, maxval=1.0)
        comp = jax.jit(lambda p, x, k: pipe.restore(p, x, k)).lower(
            pp, low, jax.random.key(0)).compile()

        def chain(i, img=[low]):
            img[0] = comp(pp, img[0], jax.random.key(100 + i))
            return img[0]

        t_e2e = timeit(chain, n=10)
        print(f"{impl:13s}: draw(4,256,256,4) {t_draw*1e3:6.3f} ms   "
              f"e2e b4 {t_e2e*1e3:7.2f} ms", flush=True)
        del comp, pp, params, pipe
        import gc
        gc.collect()
        jax.clear_caches()


if __name__ == "__main__":
    main()
