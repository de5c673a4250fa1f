"""Stage-3 step decomposition: where do the ~490 bf16 ms go?

Times each sub-program of the train step separately (same graphs the
trainer jits) and a few ablations to locate the next lever:

  d_phase        : embedding + D update (+R1 cond, not taken)
  g_phase        : G fwd/bwd + D fwd + LPIPS/ID + Adam + EMA
  g_phase_nonets : percept=0, id=0 (loss-net subgraph dropped)
  *_noremat      : remat=False (bf16 halves activation residency — the
                   512px b4 step may now fit without recompute)
  embed_only     : the frozen encode+DDPM+decode alone
  gen_fwd        : one RestoreNet forward (the D-phase fake_d cost)

Usage (TPU, idle host):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_stage3_phases.py
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def flush(x):
    return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32))))


def timeit(run, n=8):
    run(2)
    best = None
    for _ in range(2):
        dt = (run(2 + n) - run(2)) / n
        if dt > 0:
            best = dt if best is None else min(best, dt)
    return best if best is not None else run(n) / n


def build(remat=True, nets=True, dtype="bfloat16"):
    from vspbfr_tpu.pipeline import RestorationPipeline
    from vspbfr_tpu.train.restore_train import (RestoreTrainConfig,
                                                RestoreTrainer)
    size = 512
    pipe = RestorationPipeline(size=size, decoder_size=1024)
    trainer = RestoreTrainer(
        RestoreTrainConfig(size=size, batch=4, compute_dtype=dtype,
                           remat=remat,
                           percept_weight=0.5 if nets else 0.0,
                           id_weight=0.1 if nets else 0.0), pipe)
    g_state, d_state, g_ema, frozen = jax.jit(trainer.init_states)(
        jax.random.key(0))
    g_ema = jax.tree.map(lambda x: jnp.asarray(np.array(x)), g_ema)
    low = jax.random.uniform(jax.random.key(1), (4, size, size, 3),
                             minval=-1.0, maxval=1.0)
    real = jax.random.uniform(jax.random.key(2), low.shape,
                              minval=-1.0, maxval=1.0)
    return trainer, g_state, d_state, g_ema, frozen, low, real


def main():
    out = {}

    def note(k, dt):
        out[k] = round(dt * 1e3, 1)
        print(f"{k:20s} {dt*1e3:7.1f} ms", flush=True)

    for remat, nets, tag in ((True, True, ""), (False, True, "_noremat"),
                             (True, False, "_nonets")):
        t0 = time.perf_counter()
        trainer, g_state, d_state, g_ema, frozen, low, real = build(
            remat=remat, nets=nets)
        jit_d = jax.jit(trainer.d_phase)
        jit_g = jax.jit(trainer.g_phase)
        args_d = (d_state, g_state.params, jnp.ones((), jnp.int32), frozen,
                  low, real, jax.random.key(3))
        try:
            cd = jit_d.lower(*args_d).compile()
            d2, clean, feats, _, _ = cd(*args_d)
            args_g = (g_state, g_ema, d2.params, frozen, low, real, clean,
                      feats, jax.random.key(4))
            cg = jit_g.lower(*args_g).compile()
            print(f"[compiled {tag or 'base'} "
                  f"{time.perf_counter()-t0:.0f}s]", flush=True)

            def run_d(n):
                t = time.perf_counter()
                for i in range(n):
                    r = cd(*args_d)
                flush(r[3])
                return time.perf_counter() - t

            def run_g(n):
                t = time.perf_counter()
                for i in range(n):
                    r = cg(*args_g)
                flush(r[2])
                return time.perf_counter() - t

            note(f"d_phase{tag}", timeit(run_d))
            note(f"g_phase{tag}", timeit(run_g))
        except Exception as e:  # noqa: BLE001
            out[f"err{tag}"] = f"{type(e).__name__}: {str(e)[:160]}"
            print(out[f"err{tag}"], flush=True)
        del trainer, g_state, d_state, g_ema, frozen
        jax.clear_caches()
        import gc
        gc.collect()

    # embedding alone + one generator forward (base config)
    trainer, g_state, d_state, g_ema, frozen, low, real = build()

    def embed(frozen, low, k):
        return trainer._frozen_embedding(frozen, low, k)

    ce = jax.jit(embed).lower(frozen, low, jax.random.key(5)).compile()

    def run_e(n):
        t = time.perf_counter()
        for i in range(n):
            r = ce(frozen, low, jax.random.key(5))
        flush(r[0])
        return time.perf_counter() - t

    note("embed_only", timeit(run_e))
    clean, feats = ce(frozen, low, jax.random.key(5))

    def gen(g_params, low, feats, clean, k):
        return trainer._generate(g_params, low, feats, clean, k)

    cgf = jax.jit(gen).lower(g_state.params, low, feats, clean,
                             jax.random.key(6)).compile()

    def run_gf(n):
        t = time.perf_counter()
        for i in range(n):
            r = cgf(g_state.params, low, feats, clean, jax.random.key(6))
        flush(r)
        return time.perf_counter() - t

    note("gen_fwd", timeit(run_gf))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
