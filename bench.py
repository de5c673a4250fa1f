"""Headline benchmark: 512px blind-face-restoration throughput on one chip.

Measures BASELINE config (1)/(2): batch-4 512x512 full-pipeline restore
(e4e encode -> 4-step DDPM -> 1024px StyleGAN2 decode -> RestoreNet), the
reference's product path (`restoration_test.py:87-157`).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline anchors to an estimated reference throughput of 12 imgs/s for
torch 1.12 fp32 on A100 (the reference publishes no numbers — BASELINE.md;
estimate from the pipeline's ~3.5 TFLOP/img at ~40% A100 fp32+TC util).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_IMGS_PER_SEC = 12.0
BATCH = 4
WARMUP = 3
ITERS = 10


def main() -> None:
    from vspbfr_tpu.pipeline import RestorationPipeline

    pipe = RestorationPipeline(size=512, decoder_size=1024)
    params = jax.jit(pipe.init_params)(jax.random.key(0))
    jax.block_until_ready(params)

    @jax.jit
    def restore(params, low, rng):
        return pipe.restore(params, low, rng)

    low = jax.random.uniform(jax.random.key(1), (BATCH, 512, 512, 3),
                             minval=-1.0, maxval=1.0)

    def flush(x):
        """Force completion: on the tunneled TPU platform block_until_ready
        does not actually block, so read back a scalar reduction."""
        import numpy as np
        return float(np.asarray(jnp.sum(x)))

    def run(n_iters, img):
        t0 = time.perf_counter()
        for i in range(n_iters):
            # chain: feed the output back in so iterations cannot overlap
            img = restore(params, img, jax.random.key(100 + i))
        flush(img)
        return time.perf_counter() - t0

    for i in range(WARMUP):
        flush(restore(params, low, jax.random.key(i)))

    t_short = run(2, low)
    t_long = run(2 + ITERS, low)
    dt = (t_long - t_short) / ITERS  # fixed readback latency cancels

    imgs_per_sec = BATCH / dt
    print(json.dumps({
        "metric": "restore_512px_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 3),
        "unit": "imgs/s",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
