"""bf16 mixed-precision stage-3 training: speed + loss-curve overlay vs f32
(VERDICT r3 #4).

Runs the SAME training trajectory (same init, same data batches, same RNG
keys) twice — full f32 (the reference's dtype, `restoration_train.py`) and
bf16 G/D compute with f32 params/optimizer/logits/R1 (RestoreTrainConfig
compute_dtype) — on on-the-fly degraded synthetic data, and reports:

  * steady step time both ways (the speed claim),
  * per-metric curve divergence: mean |bf16 - f32| over the last half of
    training, normalized by the f32 metric's step-to-step std (a GAN loss
    is noisy; divergence must be read against that noise floor).

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_bf16_train.py \
      [--steps 200] [--size 512] [--batch 4]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp


def make_dataset(n, size):
    from PIL import Image
    d = tempfile.mkdtemp(prefix="vspbfr_bf16train_")
    rng = np.random.default_rng(0)
    for i in range(n):
        base = rng.integers(0, 255, (size // 8, size // 8, 3), np.uint8)
        img = Image.fromarray(base).resize((size + 38, size + 38),
                                           Image.Resampling.BILINEAR)
        img.save(os.path.join(d, f"{i:04d}.jpg"), quality=92)
    return d


def run(compute_dtype, steps, size, batch, batches, flush):
    from vspbfr_tpu.pipeline import RestorationPipeline
    from vspbfr_tpu.train.restore_train import (RestoreTrainConfig,
                                                RestoreTrainer)

    pipe = RestorationPipeline(size=size, decoder_size=2 * size)
    trainer = RestoreTrainer(
        RestoreTrainConfig(size=size, batch=batch,
                           compute_dtype=compute_dtype), pipe)
    g_state, d_state, g_ema, frozen = jax.jit(trainer.init_states)(
        jax.random.key(0))
    g_ema = jax.tree.map(lambda x: jnp.asarray(np.array(x)), g_ema)
    step = trainer.jit_step()

    curves = []
    t0 = None
    for i in range(steps):
        lq, gt = batches[i % len(batches)]
        g_state, d_state, g_ema, m = step(
            g_state, d_state, g_ema, frozen, lq, gt, jax.random.key(100 + i))
        curves.append({k: float(v) for k, v in m.items()})
        if i == 4:          # skip compile + warmup
            flush(m)
            t0 = time.perf_counter()
            n0 = i
    flush(m)
    dt = (time.perf_counter() - t0) / (steps - 1 - n0)
    return curves, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--n_batches", type=int, default=16)
    args = ap.parse_args()

    from vspbfr_tpu.data.datasets import RestoreTrainDataset
    from vspbfr_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    def flush(x):
        return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0])))

    # fixed pool of degraded batches: both runs see the identical stream
    root = make_dataset(2 * args.n_batches, args.size)
    ds = RestoreTrainDataset(root, im_size=(args.size, args.size),
                             n_degraded=1, seed=3)
    batches = []
    for b in range(args.n_batches):
        rows = [ds.sample(b * args.batch + j) for j in range(args.batch)]
        lq = jnp.asarray(np.stack([r[0] for r in rows]))
        gt = jnp.asarray(np.stack([r[-1] for r in rows]))
        batches.append((lq, gt))
    print(f"data ready: {args.n_batches} batches of {args.batch}",
          flush=True)

    c32, dt32 = run(None, args.steps, args.size, args.batch, batches, flush)
    print(f"f32: {dt32*1e3:.1f} ms/step", flush=True)
    c16, dt16 = run("bfloat16", args.steps, args.size, args.batch, batches,
                    flush)
    print(f"bf16: {dt16*1e3:.1f} ms/step ({dt32/dt16:.2f}x)", flush=True)

    half = args.steps // 2
    report = {"step_ms_f32": round(dt32 * 1e3, 1),
              "step_ms_bf16": round(dt16 * 1e3, 1),
              "speedup": round(dt32 / dt16, 3), "metrics": {}}
    for k in c32[0]:
        a = np.array([c[k] for c in c32[half:]])
        b = np.array([c[k] for c in c16[half:]])
        noise = max(float(a.std()), 1e-6)
        report["metrics"][k] = {
            "f32_mean": round(float(a.mean()), 4),
            "bf16_mean": round(float(b.mean()), 4),
            "f32_step_std": round(float(a.std()), 4),
            "abs_mean_diff_over_noise": round(
                abs(float(a.mean() - b.mean())) / noise, 3),
        }
    print(json.dumps(report, indent=1))
    with open("/tmp/exp_bf16_train.json", "w") as f:
        json.dump({"report": report, "f32": c32, "bf16": c16}, f)


if __name__ == "__main__":
    main()
