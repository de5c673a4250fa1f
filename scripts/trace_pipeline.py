"""Capture an XProf device trace of the full inference graph and dump
per-op HLO stats (top self-time ops), to target kernel work precisely.

Run on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/trace_pipeline.py \
      [--batch 4] [--out /tmp/vspbfr_trace]

Parses the captured xplane.pb with xprof's converters (hlo_stats) and
prints the top-N ops by self time; the raw trace stays on disk for the
TensorBoard profile viewer.
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--dec", type=int, default=1024)
    ap.add_argument("--out", default="/tmp/vspbfr_trace")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    from vspbfr_tpu.pipeline import RestorationPipeline
    from vspbfr_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    import numpy as np

    pipe32 = RestorationPipeline(size=args.size, decoder_size=args.dec)
    pipe = RestorationPipeline(size=args.size, decoder_size=args.dec,
                               compute_dtype=jnp.bfloat16)
    params = jax.jit(pipe32.init_params)(jax.random.key(0))
    low = jax.random.uniform(jax.random.key(1),
                             (args.batch, args.size, args.size, 3),
                             minval=-1.0, maxval=1.0)
    comp = jax.jit(lambda p, x, k: pipe.restore(p, x, k)).lower(
        params, low, jax.random.key(0)).compile()

    def flush(x):
        return float(np.asarray(jnp.sum(x)))

    for i in range(3):  # warm
        flush(comp(params, low, jax.random.key(i)))
    print("warmed; tracing...", flush=True)

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        out = None
        for i in range(6):
            out = comp(params, low, jax.random.key(50 + i))
        flush(out)

    xplanes = sorted(glob.glob(os.path.join(
        args.out, "**", "*.xplane.pb"), recursive=True))
    print(f"trace captured: {xplanes}", flush=True)
    if not xplanes:
        return

    data = None
    for modname in ("xprof.convert.raw_to_tool_data",
                    "tensorboard_plugin_profile.convert.raw_to_tool_data"):
        try:
            mod = __import__(modname, fromlist=["convert_raw_to_tool_data"])
            for tool in ("hlo_stats", "hlo_stats^"):
                try:
                    data, _ = mod.convert_raw_to_tool_data(
                        xplanes, tool, {})
                    break
                except Exception as e:  # noqa: BLE001
                    print(f"{modname}/{tool}: {type(e).__name__}: "
                          f"{str(e)[:120]}", flush=True)
            if data is not None:
                break
        except ImportError:
            continue
    if data is None:
        print("no converter worked; inspect the trace in tensorboard")
        return

    if isinstance(data, bytes):
        data = data.decode("utf-8", errors="replace")
    raw_path = os.path.join(args.out, "hlo_stats.json")
    with open(raw_path, "w") as f:
        f.write(data)
    try:
        stats = json.loads(data)
    except json.JSONDecodeError:
        print(f"hlo_stats written to {raw_path} (not JSON); head:")
        print(data[:2000])
        return

    # gviz DataTable: {cols: [...], rows: [{c: [{v: ...}, ...]}, ...]}
    if isinstance(stats, dict) and "rows" in stats:
        cols = [c.get("label") or c.get("id") for c in stats["cols"]]
        rows = [[c.get("v") if isinstance(c, dict) else c
                 for c in r["c"]] for r in stats["rows"]]
        try:
            i_time = next(i for i, c in enumerate(cols)
                          if "self" in str(c).lower()
                          and "time" in str(c).lower()
                          and "%" not in str(c))
        except StopIteration:
            i_time = 0
        rows.sort(key=lambda r: -(r[i_time] or 0))
        print(json.dumps(cols))
        for r in rows[: args.top]:
            print(json.dumps(r)[:400])
    else:
        print(json.dumps(stats)[:4000])


if __name__ == "__main__":
    main()
