"""Training-step benchmark (BASELINE configs 3/4): stage-3 GAN step and
stage-2 diffuser step wall time on the current device.

Usage: PYTHONPATH=.:.../axon_site python scripts/bench_train.py [--size 512]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def flush(tree):
    return float(np.asarray(jnp.sum(jax.tree.leaves(tree)[0])))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--decoder_size", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--stage", choices=["3", "2", "both"], default="3")
    args = ap.parse_args()

    from vspbfr_tpu.pipeline import RestorationPipeline

    if args.stage in ("3", "both"):
        from vspbfr_tpu.train.restore_train import (RestoreTrainConfig,
                                                    RestoreTrainer)
        pipe = RestorationPipeline(size=args.size,
                                   decoder_size=args.decoder_size)
        trainer = RestoreTrainer(
            RestoreTrainConfig(size=args.size, batch=args.batch), pipe)
        states = jax.jit(trainer.init_states)(jax.random.key(0))
        g_state, d_state, g_ema, frozen = states
        low = jax.random.uniform(jax.random.key(1),
                                 (args.batch, args.size, args.size, 3),
                                 minval=-1.0, maxval=1.0)
        real = jax.random.uniform(jax.random.key(2), low.shape,
                                  minval=-1.0, maxval=1.0)
        step = trainer.jit_step()

        def run(n):
            nonlocal g_state, d_state, g_ema
            t0 = time.perf_counter()
            for i in range(n):
                g_state, d_state, g_ema, metrics = step(
                    g_state, d_state, g_ema, frozen, low, real,
                    jax.random.key(10 + i))
            flush(metrics)
            return time.perf_counter() - t0

        run(1)
        t1, t2 = run(2), run(2 + args.iters)
        dt = (t2 - t1) / args.iters
        print(f"stage3_gan_step_{args.size}px_b{args.batch}: "
              f"{dt * 1e3:.1f} ms/step = {args.batch / dt:.2f} imgs/s")

    if args.stage in ("2", "both"):
        from vspbfr_tpu.train.diffuser_train import (DiffuserTrainConfig,
                                                     DiffuserTrainer)
        size2 = 256
        pipe2 = RestorationPipeline(size=size2, decoder_size=args.decoder_size)
        b2 = args.batch if args.stage == "2" else 16
        trainer2 = DiffuserTrainer(
            DiffuserTrainConfig(size=size2, batch=b2), pipe2)
        state, frozen2 = jax.jit(trainer2.init_states)(jax.random.key(0))
        low = jax.random.uniform(jax.random.key(1), (b2, size2, size2, 3),
                                 minval=-1.0, maxval=1.0)
        real = jax.random.uniform(jax.random.key(2), low.shape,
                                  minval=-1.0, maxval=1.0)
        step2 = trainer2.jit_step()

        def run2(n):
            nonlocal state
            t0 = time.perf_counter()
            for i in range(n):
                state, metrics = step2(state, frozen2, low, real,
                                       jax.random.key(20 + i))
            flush(metrics)
            return time.perf_counter() - t0

        run2(1)
        t1, t2 = run2(2), run2(2 + args.iters)
        dt = (t2 - t1) / args.iters
        print(f"stage2_diffuser_step_256px_b{b2}: {dt * 1e3:.1f} ms/step "
              f"= {b2 / dt:.2f} imgs/s")


if __name__ == "__main__":
    main()
