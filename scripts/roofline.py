"""Roofline: measured stage time vs the hardware lower bound.

For each compiled prefix of the inference pipeline (encode / +ddpm /
+decode / full — the same graphs bench.py sections 1/3 time) and for the
two stage-3 training phases, pull the XLA executable's cost_analysis
(flops + HBM bytes accessed), diff consecutive prefixes into per-stage
costs, and compute the roofline bound

    t_lb = max(flops / peak_flops_dtype, bytes / hbm_bw)

Attainable MFU = what MFU would look like if the stage ran exactly at its
roofline; measured/attainable says how much headroom XLA+Pallas left.

Caveats (also printed): XLA's `bytes accessed` counts every op's operand
+ result traffic as if nothing stayed in registers/VMEM — post-fusion it
is an OVER-estimate of true HBM traffic, so the bandwidth bound is
conservative (attainable is an underestimate). flops counts the padded
FLOPs the compiled HLO actually issues (e.g. the packed fusion conv's
4x-density waste is already inside it), so "MFU" here is issued-FLOPs
utilization; useful-FLOPs MFU is lower by the density factors recorded in
ROADMAP.md.

Run on the chip:  PYTHONPATH=/root/repo python scripts/roofline.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# v5e per-chip: 197 TF/s bf16 MXU peak (f32 runs at half), 819 GB/s HBM
PEAK_BF16 = 197e12
HBM_BW = 819e9

SIZE, DEC = 512, 1024
BATCH = 4


def cost(compiled):
    c = compiled.cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    out = {"flops": float(c.get("flops", 0.0))}
    out["bytes"] = float(c.get("bytes accessed", 0.0))
    return out


def flush(x):
    return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0])))


def timeit(fn, n=6):
    def r(k):
        out = None
        t0 = time.perf_counter()
        for i in range(k):
            out = fn(jax.random.key(50 + i))
        flush(out)
        return time.perf_counter() - t0
    r(2)
    for _ in range(2):
        dt = (r(2 + n) - r(2)) / n
        if dt > 0:
            return dt
    return r(n) / n


def main():
    from vspbfr_tpu.pipeline import RestorationPipeline
    from vspbfr_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    pipe = RestorationPipeline(size=SIZE, decoder_size=DEC,
                               compute_dtype=jnp.bfloat16)
    pipe32 = RestorationPipeline(size=SIZE, decoder_size=DEC)
    params = jax.jit(pipe32.init_params)(jax.random.key(0))
    low = jax.random.uniform(jax.random.key(1), (BATCH, SIZE, SIZE, 3),
                             minval=-1.0, maxval=1.0)

    rows = {}
    prev_t, prev = 0.0, {"flops": 0.0, "bytes": 0.0}
    # dtype of the MXU work per stage: encode+ddpm are f32 islands
    stage_dtype = {"encode": "f32", "ddpm": "f32",
                   "decode": "bf16", "restore": "bf16"}
    for cut in ("encode", "ddpm", "decode", None):
        name = cut or "restore"
        comp = jax.jit(
            lambda p, x, k, c=cut: pipe.restore(p, x, k, upto=c)
            if c else pipe.restore(p, x, k)).lower(
            params, low, jax.random.key(0)).compile()
        t = timeit(lambda k, c=comp: c(params, low, k))
        cc = cost(comp)
        d_f, d_b = cc["flops"] - prev["flops"], cc["bytes"] - prev["bytes"]
        d_t = t - prev_t
        prev_t, prev = t, cc
        peak = PEAK_BF16 if stage_dtype[name] == "bf16" else PEAK_BF16 / 2
        t_flops, t_bytes = d_f / peak, d_b / HBM_BW
        t_lb = max(t_flops, t_bytes)
        rows[name] = {
            "measured_ms": round(d_t * 1e3, 2),
            "flops_e9": round(d_f / 1e9, 1),
            "hbm_gb": round(d_b / 1e9, 3),
            "bound": "bandwidth" if t_bytes > t_flops else "compute",
            "roofline_ms": round(t_lb * 1e3, 2),
            "frac_of_roofline": round(t_lb / d_t, 3),
            "mfu_measured": round(d_f / d_t / PEAK_BF16, 4),
            "mfu_attainable": round(d_f / t_lb / PEAK_BF16, 4),
        }
        print(f"{name:8s} {rows[name]}", flush=True)

    total_ms = round(prev_t * 1e3, 2)
    print(json.dumps({"batch": BATCH, "e2e_ms": total_ms, "stages": rows,
                      "peak_bf16_tf": PEAK_BF16 / 1e12,
                      "hbm_gb_s": HBM_BW / 1e9}))


if __name__ == "__main__":
    main()
