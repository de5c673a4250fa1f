"""A/B: in-store fused styled epilogue (commit 63f54c3) vs two-pass
(Pallas conv + XLA-fused epilogue chain) at the PRODUCT graph level.

The fused form won its microbenchmark (exp_conv_epi.py) but BENCH_r4
regressed e2e b4 59.0 -> 67.6 ms vs round 3 while the untouched encode
stage got faster — the prime suspect. Round 1 had already measured-and-
rejected an epilogue kernel ("XLA fuses the whole chain into one 639 GB/s
pass"); this measures the re-landed version e2e, plus the decode prefix to
localize.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_epi_ab.py
"""

import os
import time

import numpy as np


def flush(x):
    import jax
    import jax.numpy as jnp
    return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0]
                                    .astype(jnp.float32))))


def main():
    import jax
    import jax.numpy as jnp
    from vspbfr_tpu.pipeline import RestorationPipeline
    from vspbfr_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    pipe = RestorationPipeline(size=512, decoder_size=1024,
                               compute_dtype=jnp.bfloat16)
    params = jax.jit(pipe.init_params)(jax.random.key(0))
    pp = pipe.prepare_params(params)
    low = jax.random.uniform(jax.random.key(1), (4, 512, 512, 3),
                             minval=-1.0, maxval=1.0)

    def timeit(comp, n=12):
        img = low

        def run(k):
            nonlocal img
            t0 = time.perf_counter()
            for i in range(k):
                img = comp(pp, img, jax.random.key(90 + i))
            flush(img)
            return time.perf_counter() - t0

        run(2)
        return (run(2 + n) - run(2)) / n

    for flag in ("1", "0"):
        os.environ["VSPBFR_FUSED_EPI"] = flag
        e2e = jax.jit(lambda p, x, k: pipe.restore(p, x, k)).lower(
            pp, low, jax.random.key(0)).compile()
        t_e2e = timeit(e2e)
        dec = jax.jit(lambda p, x, k: pipe.restore(p, x, k,
                                                   upto="decode")).lower(
            pp, low, jax.random.key(0)).compile()

        def dec_run(i, c=dec):
            return c(pp, low, jax.random.key(90 + i))

        def timeit_nochain(fn, n=12):
            def run(k):
                out = None
                t0 = time.perf_counter()
                for i in range(k):
                    out = fn(i)
                flush(out)
                return time.perf_counter() - t0
            run(2)
            return (run(2 + n) - run(2)) / n

        t_dec = timeit_nochain(dec_run)
        print(f"fused_epi={flag}: e2e b4 {t_e2e*1e3:7.2f} ms   "
              f"decode-prefix {t_dec*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
