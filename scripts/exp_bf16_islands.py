"""Round-5 bf16 islands A/B: stage-3 step time with the two new islands
toggled (VERDICT r4 #4 — close the 498.7 -> <=450 ms gap).

Arms (all compute_dtype=bf16, b4 512px, idle host required):
  base      : bf16_embed=False, bf16_loss_nets=False  (the r4 recipe)
  embed     : bf16 frozen StyleGAN2 decode in the per-step embedding
  lossnets  : bf16 LPIPS-VGG16 / ArcFace trunks (f32 heads/reductions)
  both      : both islands

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_bf16_islands.py \
      [--iters 8] [--size 512] [--batch 4]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def measure(arm, size, batch, iters, flush):
    from vspbfr_tpu.pipeline import RestorationPipeline
    from vspbfr_tpu.train.restore_train import (RestoreTrainConfig,
                                                RestoreTrainer)
    embed, lossnets = arm
    pipe = RestorationPipeline(size=size, decoder_size=2 * size)
    trainer = RestoreTrainer(
        RestoreTrainConfig(size=size, batch=batch, compute_dtype="bfloat16",
                           bf16_embed=embed, bf16_loss_nets=lossnets), pipe)
    g_state, d_state, g_ema, frozen = jax.jit(trainer.init_states)(
        jax.random.key(0))
    g_ema = jax.tree.map(lambda x: jnp.asarray(np.array(x)), g_ema)
    low = jax.random.uniform(jax.random.key(1), (batch, size, size, 3),
                             minval=-1.0, maxval=1.0)
    real = jax.random.uniform(jax.random.key(2), low.shape,
                              minval=-1.0, maxval=1.0)
    step = trainer.jit_step()

    def run(n):
        nonlocal g_state, d_state, g_ema
        t0 = time.perf_counter()
        for i in range(n):
            g_state, d_state, g_ema, m = step(
                g_state, d_state, g_ema, frozen, low, real,
                jax.random.key(10 + i))
        flush(m)
        return time.perf_counter() - t0

    run(2)  # compile + warm
    best = None
    for _ in range(2):  # min-of-two chains (tunnel stalls)
        dt = (run(2 + iters) - run(2)) / iters
        if dt > 0:
            best = dt if best is None else min(best, dt)
    if best is None:
        best = run(iters) / iters
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    def flush(x):
        return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0])))

    arms = {"base": (False, False), "embed": (True, False),
            "lossnets": (False, True), "both": (True, True)}
    out = {}
    for name, arm in arms.items():
        t0 = time.perf_counter()
        dt = measure(arm, args.size, args.batch, args.iters, flush)
        out[name] = round(dt * 1e3, 1)
        print(f"[{time.perf_counter()-t0:6.1f}s] {name}: {dt*1e3:.1f} ms",
              flush=True)
        jax.clear_caches()
        import gc
        gc.collect()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
