"""Headline benchmark: 512px blind-face-restoration throughput on one chip.

Measures BASELINE config (1)/(2): batch-4 512x512 full-pipeline restore
(e4e encode -> 4-step DDPM -> 1024px StyleGAN2 decode -> RestoreNet), the
reference's product path (`restoration_test.py:87-157`).

Headline = the production inference dtype: bf16 with f32 islands (the e4e
encode + DDPM latent chain stay f32; the two MXU-bound stages — frozen
decode and RestoreNet — run bf16; see pipeline.RestorationPipeline.restore).
The full-f32 throughput and the bf16-vs-f32 output PSNR are reported
alongside so both the speed and the quality cost are auditable.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "flops",
"mfu", "stage_ms", "f32_imgs_per_sec", "bf16_vs_f32_psnr_db"} — flops from
the compiled executable's cost_analysis, mfu against the chip's peak,
stage_ms the encode/ddpm/decode/restore latency split (bf16 pipeline).

vs_baseline anchors to an estimated reference throughput of 12 imgs/s for
torch 1.12 fp32 on A100 (the reference publishes no numbers — see
BASELINE.md "Estimate derivation").
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

BASELINE_IMGS_PER_SEC = 12.0
BATCH = 4
WARMUP = 3
ITERS = 10
# VSPBFR_BENCH_SMOKE=1: tiny config for a fast code-path check (e.g. on CPU
# when the chip is unreachable); numbers are NOT the headline
SMOKE = os.environ.get("VSPBFR_BENCH_SMOKE") == "1"
SIZE, DEC_SIZE = (64, 128) if SMOKE else (512, 1024)

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

    from vspbfr_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    pipe32 = RestorationPipeline(size=SIZE, decoder_size=DEC_SIZE)
    pipe = RestorationPipeline(size=SIZE, decoder_size=DEC_SIZE,
                               compute_dtype=jnp.bfloat16)
    params = jax.jit(pipe32.init_params)(jax.random.key(0))
    jax.block_until_ready(params)

    low = jax.random.uniform(jax.random.key(1), (BATCH, SIZE, SIZE, 3),
                             minval=-1.0, maxval=1.0)

    # AOT-compile once and reuse the executables (jit + a later
    # .lower().compile() for cost_analysis would compile the 512px graph
    # twice — ~10 min each over the compile tunnel)
    compiled = jax.jit(
        lambda p, x, k: pipe.restore(p, x, k)).lower(
        params, low, jax.random.key(0)).compile()
    compiled32 = jax.jit(
        lambda p, x, k: pipe32.restore(p, x, k)).lower(
        params, low, jax.random.key(0)).compile()

    def restore(params, low, rng):
        return compiled(params, low, rng)

    def restore32(params, low, rng):
        return compiled32(params, low, rng)

    def flush(x):
        """Force completion: on the tunneled TPU platform block_until_ready
        does not actually block, so read back a scalar reduction."""
        return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0])))

    def run(fn, n_iters, img):
        t0 = time.perf_counter()
        for i in range(n_iters):
            # chain: feed the output back in so iterations cannot overlap
            img = fn(params, img, jax.random.key(100 + i))
        flush(img)
        return time.perf_counter() - t0

    for i in range(WARMUP):
        flush(restore(params, low, jax.random.key(i)))
        flush(restore32(params, low, jax.random.key(i)))

    dt = (run(restore, 2 + ITERS, low) - run(restore, 2, low)) / ITERS
    dt32 = (run(restore32, 2 + ITERS, low) - run(restore32, 2, low)) / ITERS

    imgs_per_sec = BATCH / dt
    f32_imgs_per_sec = BATCH / dt32

    # bf16 quality vs the f32 pipeline on the same inputs + random stream.
    # data_range adapts to the actual output magnitude: with random init
    # the un-normalized ToRGB skip cascade emits O(100) values, so a fixed
    # [-1,1] range would report garbage (with converted trained weights
    # outputs are in [-1,1] and this reduces to the usual PSNR).
    out16 = np.asarray(restore(params, low, jax.random.key(7)))
    out32 = np.asarray(restore32(params, low, jax.random.key(7)))
    mse = float(np.mean((out16 - out32) ** 2))
    rng_ = max(2.0 * float(np.abs(out32).max()), 2.0)
    psnr_db = round(10 * np.log10(rng_ ** 2 / max(mse, 1e-12)), 2)

    # auditable FLOPs + MFU from the compiled executable
    flops = mfu = None
    try:
        cost = compiled.cost_analysis()
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

    # stage fns mirror restore()'s dtype policy: encode/ddpm f32,
    # decode/RestoreNet bf16 (params cast inside the jit)
    enc = jax.jit(lambda p, x: pipe.psp.get_w_plus(p["psp"], x))
    diff = jax.jit(lambda p, w, k: pipe.diffuse_latent(p, w, k))

    def dec_body(p, w, k):
        dp = {**p["psp"], "decoder": pipe._cast(p["psp"]["decoder"])}
        return pipe.psp.decode_with_feats(dp, w.astype(jnp.bfloat16),
                                          noise_rng=k)

    dec_fn = jax.jit(dec_body)

    def gen_fn(p, x, feats, lat, k):
        gp = pipe._cast(p["generator"])
        k1, k2 = jax.random.split(k)
        nl = pipe.sample_mixing_latent(gp, k1, x.shape[0])
        return pipe.generator.apply(
            {"params": gp}, x.astype(jnp.bfloat16), feats,
            lat.astype(jnp.bfloat16), nl,
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
        "dtype": "bf16+f32-islands",
        "f32_imgs_per_sec": round(f32_imgs_per_sec, 3),
        "bf16_vs_f32_psnr_db": psnr_db,
    }))


if __name__ == "__main__":
    main()
