"""A/B: stage-3 train-step time with the packed layout ON vs OFF.

Round-3 found the measured stage-3 step (b4, 512px, f32) at 1022 ms vs the
round-1 715.7 ms prose figure. The packed space-to-depth layout
(packed_min_res=512) is tuned for inference; its custom-vjp backwards run
the XLA reference composition, which may cost more than packing saves when
gradients dominate. This times both configs at the product shapes.

Run ON THE CHIP (one TPU job at a time):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_train_packed.py
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from vspbfr_tpu.pipeline import RestorationPipeline
from vspbfr_tpu.train.restore_train import RestoreTrainConfig, RestoreTrainer
from vspbfr_tpu.utils.runtime import enable_compilation_cache


def bench_config(label: str, pmr: int, size: int, batch: int,
                 remat: bool) -> dict:
    pipe = RestorationPipeline(size=size, decoder_size=1024,
                               packed_min_res=pmr)
    trainer = RestoreTrainer(
        RestoreTrainConfig(size=size, batch=batch, remat=remat), pipe)
    g_state, d_state, g_ema, frozen = jax.jit(trainer.init_states)(
        jax.random.key(0))
    g_ema = jax.tree.map(lambda x: jnp.asarray(np.array(x)), g_ema)
    low = jax.random.uniform(jax.random.key(1), (batch, size, size, 3),
                             minval=-1.0, maxval=1.0)
    real = jax.random.uniform(jax.random.key(2), low.shape,
                              minval=-1.0, maxval=1.0)

    jit_d = jax.jit(trainer.d_phase, donate_argnums=(0,))
    jit_g = jax.jit(trainer.g_phase, donate_argnums=(0, 1))
    args_d = (d_state, g_state.params, jnp.zeros((), jnp.int32), frozen,
              low, real, jax.random.key(3))
    cd = jit_d.lower(*args_d).compile()
    d2, clean, feats, d_metrics, _ = cd(*args_d)
    args_g = (g_state, g_ema, d2.params, frozen, low, real, clean, feats,
              jax.random.key(4))
    cg = jit_g.lower(*args_g).compile()
    d_state = d2
    print(f"[{label}] compiled", flush=True)

    def flush(x):
        return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0])))

    def step(g_state, d_state, g_ema, g_step, key):
        k_d, k_g = jax.random.split(key)
        d_state, clean, feats, d_m, _ = cd(
            d_state, g_state.params, g_step, frozen, low, real, k_d)
        g_state, g_ema, g_m = cg(g_state, g_ema, d_state.params, frozen,
                                 low, real, clean, feats, k_g)
        return g_state, d_state, g_ema, {**d_m, **g_m}

    def run(n, g_step):
        nonlocal g_state, d_state, g_ema
        t0 = time.perf_counter()
        for i in range(n):
            g_state, d_state, g_ema, m = step(
                g_state, d_state, g_ema, jnp.asarray(g_step, jnp.int32),
                jax.random.key(10 + i))
        flush(m)
        return time.perf_counter() - t0

    run(2, 1)
    n = 6
    dt_plain = (run(2 + n, 1) - run(2, 1)) / n
    # D-phase alone (same chained discipline)
    t0 = time.perf_counter()
    key_d = jax.random.key(99)
    d_loc = d_state
    for i in range(n):
        d_loc, clean, feats, d_m, _ = cd(
            d_loc, g_state.params, jnp.ones((), jnp.int32), frozen,
            low, real, key_d)
    flush(d_m)
    dt_d = (time.perf_counter() - t0) / n
    out = {"step_ms": dt_plain * 1e3, "d_phase_ms": dt_d * 1e3,
           "g_phase_ms": (dt_plain - dt_d) * 1e3}
    print(f"[{label}] step {out['step_ms']:.1f} ms "
          f"(D {out['d_phase_ms']:.1f} + G {out['g_phase_ms']:.1f})",
          flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()
    enable_compilation_cache()

    for label, pmr, remat in (
            ("packed  remat", 512, True),
            ("unpacked remat", 0, True),
    ):
        try:
            bench_config(label, pmr, args.size, args.batch, remat)
        except Exception as e:  # noqa: BLE001
            print(f"[{label}] FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
        jax.clear_caches()


if __name__ == "__main__":
    main()
