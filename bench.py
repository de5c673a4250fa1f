"""Headline benchmark: 512px blind-face-restoration throughput on one chip.

Measures BASELINE config (1)/(2): batch-4 512x512 full-pipeline restore
(e4e encode -> 4-step DDPM -> 1024px StyleGAN2 decode -> RestoreNet), the
reference's product path (`restoration_test.py:87-157`).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "flops",
"mfu", "stage_ms"} — flops from the compiled executable's cost_analysis so
the throughput claim is auditable, mfu against the chip's peak, stage_ms
the encode/ddpm/decode/restore latency split.

vs_baseline anchors to an estimated reference throughput of 12 imgs/s for
torch 1.12 fp32 on A100 (the reference publishes no numbers — see
BASELINE.md "Estimate derivation").
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

# peak dense matmul FLOP/s per chip (bf16; f32 runs at half via passes)
_PEAK_FLOPS = {
    "TPU v5 lite": 197e12, "TPU v5e": 197e12,
    "TPU v5p": 459e12, "TPU v4": 275e12, "TPU v6e": 918e12,
}


def _peak_flops() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in _PEAK_FLOPS.items():
        if k.lower() in kind.lower():
            return v
    return 197e12  # default: v5e


def main() -> None:
    import numpy as np

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
        return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0])))

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

    # auditable FLOPs + MFU from the compiled executable
    flops = mfu = None
    try:
        cost = restore.lower(params, low, jax.random.key(0)).compile()\
            .cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
        if flops:
            mfu = round(flops / dt / _peak_flops(), 4)
    except Exception:
        pass

    # per-stage latency split (same queue-then-flush scheme)
    def timeit(fn, n=5):
        def r(k):
            out = None
            t0 = time.perf_counter()
            for i in range(k):
                out = fn(i)
            flush(out)
            return time.perf_counter() - t0
        r(1)
        return (r(2 + n) - r(2)) / n

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
    _, feats = dec_fn(params, lat, jax.random.key(3))
    stage_ms = {
        "encode": round(1e3 * timeit(lambda i: enc(params, low)), 2),
        "ddpm": round(1e3 * timeit(
            lambda i: diff(params, w, jax.random.key(i))), 2),
        "decode": round(1e3 * timeit(
            lambda i: dec_fn(params, lat, jax.random.key(i))[0]), 2),
        "restore": round(1e3 * timeit(
            lambda i: gen(params, low, feats, lat, jax.random.key(i))), 2),
    }

    print(json.dumps({
        "metric": "restore_512px_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 3),
        "unit": "imgs/s",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
        "flops": flops,
        "mfu": mfu,
        "stage_ms": stage_ms,
    }))


if __name__ == "__main__":
    main()
