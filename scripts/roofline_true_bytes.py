"""True-bytes roofline for the RestoreNet stage (VERDICT r4 #1, option b).

XLA's cost_analysis() `bytes accessed` over-counts HBM traffic (it sums
operand+result bytes of every op as if nothing fused — ROOFLINE.md caveat;
the encode stage runs 1.4x faster than that "bound"). This script builds
the bound the honest way:

  * MEASURED peak HBM bandwidth (big strided-saxpy on-device) and MEASURED
    MXU rate (large bf16 matmul) anchor the machine model — not specs;
  * per-layer ANALYTIC minimum traffic: read the input once, write the
    output once, weights once — a true lower bound no scheduler can beat
    (branch intermediates assumed VMEM-resident, i.e. ideally fused);
  * per-layer USEFUL FLOPs at unpacked semantics (the packed layout's 4x
    density waste is an implementation cost, not workload demand);
  * per-layer measured time (same harness as exp_restorenet_layers.py).

Output: a table measured-vs-bound per layer plus the stage total, i.e.
exactly how far the current kernels sit from the physics, layer by layer.

Usage (TPU, idle host):
  PYTHONPATH=/root/repo:/root/.axon_site VSPBFR_PROF_DTYPE=bf16 \
      python scripts/roofline_true_bytes.py
"""

from __future__ import annotations

import json
import math
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

DTYPE = (jnp.bfloat16 if os.environ.get("VSPBFR_PROF_DTYPE", "bf16") == "bf16"
         else jnp.float32)
BPE = 2 if DTYPE == jnp.bfloat16 else 4


def flush(x):
    return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32))))


def timeit(fn, n=20):
    def run(k):
        out = None
        t0 = time.perf_counter()
        for i in range(k):
            out = fn(i)
        flush(out)
        return time.perf_counter() - t0

    run(1)
    return min((run(2 + n) - run(2)) / n for _ in range(2))


def measure_machine():
    """Measured HBM BW (GB/s) and MXU rate (TF/s) on THIS chip."""
    x = jnp.ones((64, 1024, 1024), DTYPE)  # 128 MB bf16

    @jax.jit
    def saxpy(x):
        return x * 1.5 + 0.5

    dt = timeit(lambda i: saxpy(x), n=30)
    bw = 2 * x.nbytes / dt / 1e9  # read + write

    m = jnp.ones((8192, 8192), DTYPE)

    @jax.jit
    def mm(a, b):
        return a @ b

    dt2 = timeit(lambda i: mm(m, m), n=10)
    tf = 2 * 8192**3 / dt2 / 1e12
    return bw, tf


# ---- analytic per-layer models (unpacked semantics) -----------------------

def smart_model(b, res, c):
    """4 dilated 3x3 mod-convs c->c/4 + 3x3 fusion conv c->c + noise/act.
    Min bytes: x in, out (branch concat assumed VMEM-fused into fusion)."""
    flops = (4 * 18 * c * (c // 4) + 18 * c * c) * res * res * b
    bytes_ = (2 * b * res * res * c) * BPE + (9 * c * c + 4 * 9 * c * (c // 4)) * BPE
    return flops, bytes_


def styled_model(b, res_in, cin, cout, up, down):
    res_out = res_in * 2 if up else (res_in // 2 if down else res_in)
    conv_res = res_out if up else res_in
    flops = 18 * cin * cout * conv_res * conv_res * b
    bytes_ = (b * res_in * res_in * cin + b * res_out * res_out * cout
              ) * BPE + 9 * cin * cout * BPE
    return flops, bytes_


def torgb_model(b, res, c):
    flops = 2 * c * 3 * res * res * b
    bytes_ = (b * res * res * (c + 3) + b * (res // 2) ** 2 * 3) * BPE
    return flops, bytes_


if __name__ == "__main__":
    b, size, pmr = 4, 512, 512
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    os.environ["VSPBFR_PROF_DTYPE"] = "bf16"
    import exp_restorenet_layers as L  # reuse the timing harness

    bw, tf = measure_machine()
    print(f"machine: HBM {bw:.0f} GB/s, MXU {tf:.0f} TF/s (measured)")

    key = jax.random.key(0)
    from vspbfr_tpu.models.stylegan2 import channel_dict
    ch = channel_dict(2)
    log = int(math.log2(size))
    rows = []

    def add(name, meas, flops, bytes_):
        t_flops = flops / (tf * 1e12)
        t_bytes = bytes_ / (bw * 1e9)
        lb = max(t_flops, t_bytes)
        rows.append({
            "layer": name, "ms": round(meas * 1e3, 3),
            "lb_ms": round(lb * 1e3, 3),
            "bound": "flops" if t_flops > t_bytes else "bytes",
            "frac": round(lb / meas, 2) if meas > 0 else None,
            "gflops": round(flops / 1e9, 1),
            "mb": round(bytes_ / 1e6, 1),
        })
        print(f"{name:24s} {meas*1e3:7.2f} ms   lb {lb*1e3:6.2f} ms "
              f"({rows[-1]['bound']}, frac {rows[-1]['frac']})", flush=True)

    # encoder
    for i in range(log, 2, -1):
        res = 2 ** i
        c, c_next = ch[res], ch[res // 2]
        pk = res >= pmr
        pk_next = (res // 2) >= pmr
        ts = L.t_smart(key, b, res, c, pk, 2)
        f_, by = smart_model(b, res, c)
        add(f"enc{res}_smart", ts, f_, by)
        td = L.t_styled(key, b, res, c, c_next, False, True, pk, pk_next, 2)
        f_, by = styled_model(b, res, c, c_next, False, True)
        add(f"enc{res}_down", td, f_, by)

    # decoder
    ts = L.t_smart(key, b, 4, ch[4], False, 4)
    f_, by = smart_model(b, 4, ch[4])
    add("dec4_smart", ts, f_, by)
    for i in range(3, log + 1):
        res = 2 ** i
        cin, cout = ch[res // 2], ch[res]
        pk_in = (res // 2) >= pmr
        pk_out = res >= pmr
        tu = L.t_styled(key, b, res // 2, cin, cout, True, False,
                        pk_in, pk_out, 4)
        f_, by = styled_model(b, res // 2, cin, cout, True, False)
        add(f"dec{res}_up", tu, f_, by)
        ts = L.t_smart(key, b, res, cout, pk_out, 4)
        f_, by = smart_model(b, res, cout)
        add(f"dec{res}_smart", ts, f_, by)
        tr = L.t_torgb(key, b, res, cout, pk_out, pk_in, 4)
        f_, by = torgb_model(b, res, cout)
        add(f"dec{res}_torgb", tr, f_, by)

    tot_ms = sum(r["ms"] for r in rows)
    tot_lb = sum(r["lb_ms"] for r in rows)
    summary = {
        "machine": {"hbm_gb_s": round(bw, 1), "mxu_tf_s": round(tf, 1)},
        "sum_measured_ms": round(tot_ms, 1),
        "sum_true_bound_ms": round(tot_lb, 1),
        "frac_of_true_bound": round(tot_lb / tot_ms, 3),
        "rows": rows,
    }
    print(json.dumps({k: summary[k] for k in
                      ("machine", "sum_measured_ms", "sum_true_bound_ms",
                       "frac_of_true_bound")}))
    with open("/tmp/roofline_true_bytes.json", "w") as f:
        json.dump(summary, f, indent=1)
