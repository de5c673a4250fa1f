"""Headline benchmark: 512px blind-face-restoration on one chip.

Sections (ordered; later ones are skipped if the wall budget runs out;
the OOM-riskiest — training — runs LAST among device sections so a
ResourceExhausted cannot poison the inference measurements):
  1. inference throughput, batch 4 (BASELINE configs (1)/(2): the
     reference's product path `restoration_test.py:87-157`, batch 4
     `restoration_test.py:212-213`), bf16 with f32 islands
  2. inference batch scaling (b8/b16): the headline `value` is the
     best-throughput batch; b4 stays as the latency row
  3. stage latency split via compiled PREFIX pipelines (encode /
     +ddpm / +decode / full share the exact product graph — see
     pipeline.restore(upto=...)), so the split sums to the end-to-end
     time instead of inflating per-call tunnel overheads
  4. full-f32 throughput + bf16-vs-f32 output PSNR (quality audit)
  5. training-step throughput: stage-3 GAN step at batch 4 / 512px
     (`restoration_train.py:312-325`) and stage-2 diffuser step at
     256px (`code_diffuser_train.py:249-273`) — BASELINE configs
     (3)/(4), full f32 (training dtype). Stage-2 runs the largest
     per-chip batch that fits 16GB HBM (the reference's per-GPU 16
     needed ~37GB and barely fit an A100-40GB; the global batch is
     recovered across the data mesh).
  6. host input-pipeline feed rate (SURVEY.md §7 starvation risk: two
     512px degradation chains per sample, `dataset.py:302-303`) vs the
     measured device demand from section 5

Prints the full detail JSON on an early line (also written to
BENCH_DETAIL.json) and a compact headline JSON as the FINAL line — the
driver's tail capture is finite, and round 4's single grown-too-long line
shipped unparsed. vs_baseline anchors to an ESTIMATED reference
throughput of 12 imgs/s (torch 1.12 fp32, A100) — the reference publishes
no numbers; see BASELINE.md "Estimate derivation". flops/mfu come from the
compiled executables' cost_analysis so the claim is re-anchorable.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_IMGS_PER_SEC = 12.0
BATCH = 4
ITERS = 10
# VSPBFR_BENCH_SMOKE=1: tiny config for a fast code-path check (e.g. on CPU
# when the chip is unreachable); numbers are NOT the headline
SMOKE = os.environ.get("VSPBFR_BENCH_SMOKE") == "1"
SIZE, DEC_SIZE = (64, 128) if SMOKE else (512, 1024)
# wall budget for the optional sections (headline always completes);
# compiles hit the persistent cache after the first run
BUDGET_S = float(os.environ.get("VSPBFR_BENCH_BUDGET_S", 5400))

_T0 = time.perf_counter()


def _elapsed() -> float:
    return time.perf_counter() - _T0


def _log(msg: str) -> None:
    print(f"[bench {_elapsed():7.1f}s] {msg}", file=sys.stderr, flush=True)


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


def _cost_flops(compiled) -> float | None:
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception:
        return None


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
    _log("params initialized")

    def flush(x):
        """Force completion: on the tunneled TPU platform block_until_ready
        does not actually block, so read back a scalar reduction."""
        return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0])))

    def make_low(batch):
        return jax.random.uniform(jax.random.key(1), (batch, SIZE, SIZE, 3),
                                  minval=-1.0, maxval=1.0)

    def compile_restore(p, batch):
        # serving path: weights pre-cast once at load (prepare_params), so
        # the compiled graph carries no per-call param convert
        pp = p.prepare_params(params)
        low = make_low(batch)
        comp = jax.jit(
            lambda pr, x, k: p.restore(pr, x, k)).lower(
            pp, low, jax.random.key(0)).compile()
        return comp, low, pp

    def run_chain(fn, n_iters, img):
        t0 = time.perf_counter()
        for i in range(n_iters):
            # chain: feed the output back in so iterations cannot overlap
            img = fn(params, img, jax.random.key(100 + i))
        flush(img)
        return time.perf_counter() - t0

    def throughput(fn, low, batch, iters=ITERS):
        for i in range(2):
            flush(fn(params, low, jax.random.key(i)))
        dt = (run_chain(fn, 2 + iters, low) - run_chain(fn, 2, low)) / iters
        return batch / dt, dt

    # ---- 1. headline inference, batch 4 (bf16 + f32 islands) --------------
    compiled_b4, low4, pp16 = compile_restore(pipe, BATCH)
    _log("b4 bf16 pipeline compiled")
    b4_imgs, b4_dt = throughput(lambda p, x, k: compiled_b4(pp16, x, k), low4,
                                BATCH)
    flops_b4 = _cost_flops(compiled_b4)
    _log(f"b4 inference: {b4_imgs:.2f} imgs/s ({b4_dt*1e3:.1f} ms)")

    result = {
        "metric": "restore_512px_imgs_per_sec_per_chip",
        "value": round(b4_imgs, 3),
        "unit": "imgs/s",
        "batch": BATCH,
        "vs_baseline": round(b4_imgs / BASELINE_IMGS_PER_SEC, 3),
        "flops": flops_b4,
        "mfu": (round(flops_b4 / b4_dt / _peak_flops(), 4)
                if flops_b4 else None),
        "latency_ms_b4": round(b4_dt * 1e3, 2),
        "dtype": "bf16+f32-islands",
        "baseline_note": "vs_baseline divides by an ESTIMATED 12 imgs/s "
                         "A100 torch-fp32 figure (BASELINE.md)",
    }

    # ---- 1b. batch-1 single-image latency (BASELINE config (1): the
    # reference's interactive use, `restoration_test.py:208-226`) ----------
    try:
        comp1, low1, _ = compile_restore(pipe, 1)
        _log("b1 bf16 pipeline compiled")
        _, b1_dt = throughput(lambda p, x, k: comp1(pp16, x, k), low1, 1,
                              iters=max(4, ITERS // 2))
        result["latency_ms_b1"] = round(b1_dt * 1e3, 2)
        _log(f"b1 latency: {b1_dt*1e3:.2f} ms")
        del comp1, low1
    except Exception as e:  # noqa: BLE001
        _log(f"b1 latency failed: {type(e).__name__}: {e}")

    # ---- 2. inference batch scaling ----------------------------------------
    scaling = {str(BATCH): round(b4_imgs, 3)}
    best_b, best_imgs = BATCH, b4_imgs
    for b in (8, 16):
        if _elapsed() > BUDGET_S:
            _log(f"budget exhausted before b{b} scaling")
            break
        try:
            comp, low, _ = compile_restore(pipe, b)
            _log(f"b{b} bf16 pipeline compiled")
            imgs, dt = throughput(lambda p, x, k: comp(pp16, x, k), low, b,
                                  iters=max(4, ITERS // 2))
            scaling[str(b)] = round(imgs, 3)
            _log(f"b{b} inference: {imgs:.2f} imgs/s")
            if imgs > best_imgs:
                best_b, best_imgs = b, imgs
                fl = _cost_flops(comp)
                result.update(
                    value=round(imgs, 3), batch=b,
                    vs_baseline=round(imgs / BASELINE_IMGS_PER_SEC, 3),
                    flops=fl,
                    mfu=round(fl / dt / _peak_flops(), 4) if fl else None)
        except Exception as e:  # noqa: BLE001
            scaling[str(b)] = None
            _log(f"b{b} scaling failed: {type(e).__name__}: {e}")
            del e
            import gc
            gc.collect()
            jax.clear_caches()  # drop dead executables before the next try
    result["batch_scaling"] = scaling

    # ---- 3. stage split via compiled prefixes ------------------------------
    try:
        if _elapsed() < BUDGET_S:
            result["stage_ms"] = stage_split(pipe, pp16, low4, flush,
                                             b4_dt, flops_b4)
    except Exception as e:  # noqa: BLE001
        _log(f"stage split failed: {type(e).__name__}: {e}")

    # ---- 4. f32 + quality audit --------------------------------------------
    try:
        if _elapsed() < BUDGET_S:
            compiled32, _, _ = compile_restore(pipe32, BATCH)
            _log("b4 f32 pipeline compiled")
            f32_imgs, _ = throughput(lambda p, x, k: compiled32(p, x, k),
                                     low4, BATCH)
            result["f32_imgs_per_sec"] = round(f32_imgs, 3)
            # bf16 quality vs the f32 pipeline on the same inputs + random
            # stream. data_range adapts to the actual output magnitude:
            # with random init the un-normalized ToRGB skip cascade emits
            # O(100) values, so a fixed [-1,1] range would report garbage
            # (with converted trained weights outputs are in [-1,1] and
            # this reduces to the usual PSNR).
            out16 = np.asarray(compiled_b4(pp16, low4, jax.random.key(7)))
            out32 = np.asarray(compiled32(params, low4, jax.random.key(7)))
            mse = float(np.mean((out16 - out32) ** 2))
            rng_ = max(2.0 * float(np.abs(out32).max()), 2.0)
            result["bf16_vs_f32_psnr_db"] = round(
                10 * np.log10(rng_ ** 2 / max(mse, 1e-12)), 2)
    except Exception as e:  # noqa: BLE001
        _log(f"f32 audit failed: {type(e).__name__}: {e}")

    # ---- 5. training-step throughput (BASELINE configs (3)/(4)) -----------
    try:
        if _elapsed() < BUDGET_S:
            # drop every inference-section device buffer + executable first:
            # params/g_ema + the b4/b16 executables otherwise stay resident
            # while the training section allocates its own G+D+EMA+frozen
            # states, pressuring the 16GB HBM (a standalone stage-3 step
            # measured 686 ms vs 1034 ms inside the loaded bench process,
            # scripts/exp_train_packed.py)
            del compiled_b4, low4, params, pp16, pipe, pipe32
            try:
                del compiled32  # noqa: F821 — absent if section 4 failed
            except NameError:
                pass
            import gc
            gc.collect()
            jax.clear_caches()
            result["train"] = {}
            bench_train(flush, result["train"])
    except Exception as e:  # noqa: BLE001 — keep the headline alive
        _log(f"train bench failed: {type(e).__name__}: {e}")
        result.setdefault("train", {})["error"] = str(e)[:200]
        del e
        import gc
        gc.collect()
        jax.clear_caches()

    # ---- 6. host input-pipeline feed rate ----------------------------------
    try:
        if _elapsed() < BUDGET_S:
            # demand anchor: the FASTEST available training mode (bf16 when
            # measured) — the loader must keep up with the best step
            tr = result.get("train", {})
            steadies = [v.get("step_ms_steady")
                        for k, v in tr.items()
                        if isinstance(v, dict) and v.get("step_ms_steady")]
            step_ms = min(steadies) if steadies else None
            result["loader"] = bench_loader(step_ms)
    except Exception as e:  # noqa: BLE001
        _log(f"loader bench failed: {type(e).__name__}: {e}")

    result["bench_wall_s"] = round(_elapsed(), 1)
    emit(result)


def emit(result) -> None:
    """Emit the results in driver-parseable form. BENCH_r04 shipped
    `parsed: null` because the single detail line outgrew the driver's
    tail-capture window — so: full detail goes to BENCH_DETAIL.json AND
    an early stdout line, and the FINAL stdout line is a compact headline
    (< ~400 bytes) the driver can always parse."""
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    try:
        with open(detail_path, "w") as f:
            json.dump(result, f, indent=1)
    except OSError as e:
        _log(f"detail file write failed: {e}")
    print(json.dumps(result), flush=True)  # full detail, EARLY line

    compact = {k: result.get(k) for k in (
        "metric", "value", "unit", "vs_baseline", "batch", "mfu",
        "latency_ms_b4", "latency_ms_b1", "bf16_vs_f32_psnr_db")}
    tr = result.get("train", {})
    for src, dst in (("stage3", "stage3_f32_ms"),
                     ("stage3_bf16", "stage3_bf16_ms")):
        row = tr.get(src)
        if isinstance(row, dict) and row.get("step_ms_steady"):
            compact[dst] = row["step_ms_steady"]
    s2 = [v["step_ms"] for k, v in tr.items()
          if k.startswith("stage2") and isinstance(v, dict)
          and v.get("step_ms") and v.get("imgs_per_sec")]
    s2r = [v["imgs_per_sec"] for k, v in tr.items()
           if k.startswith("stage2") and isinstance(v, dict)
           and v.get("imgs_per_sec")]
    if s2r:
        compact["stage2_best_imgs_per_sec"] = max(s2r)
    ld = result.get("loader", {})
    for k in ("feeds_8chip_host", "feeds_8chip_host_projected"):
        if k in ld:
            compact[k] = ld[k]
    compact["detail"] = "BENCH_DETAIL.json"
    print(json.dumps(compact), flush=True)  # FINAL line: always short


def bench_train(flush, out):
    """Stage-3 GAN step (b4, 512px, f32) + stage-2 diffuser step (256px,
    largest fitting per-chip batch): ms/step and imgs/s, with R1 cadence
    made explicit — the lazy-R1 step runs every d_reg_every=16 iters
    (`restoration_train.py:200-216`), so steady-state cost =
    (15*plain + 1*r1)/16. Mutates `out` so a stage-2 failure keeps the
    stage-3 numbers."""
    import gc

    import numpy as np

    from vspbfr_tpu.pipeline import RestorationPipeline
    from vspbfr_tpu.train.restore_train import (RestoreTrainConfig,
                                                RestoreTrainer)
    size, dec = (SIZE, DEC_SIZE)
    batch = BATCH
    try:
        bench_stage3(flush, out, None, "stage3")
    finally:
        import gc as _gc
        _gc.collect()
        jax.clear_caches()

    # ---- stage 3, bf16 mixed precision (VERDICT r3 #4): bf16 G/D compute
    # with f32 params/optimizer/logits/R1 — the proven inference recipe
    # applied to the GAN step. Quality overlay: scripts/exp_bf16_train.py.
    try:
        if _elapsed() < BUDGET_S:
            bench_stage3(flush, out, "bfloat16", "stage3_bf16")
    except Exception as e:  # noqa: BLE001
        _log(f"stage3 bf16 failed: {type(e).__name__}: {str(e)[:120]}")
        out["stage3_bf16"] = {"error": str(e)[:200]}
        del e
        gc.collect()
        jax.clear_caches()

    if _elapsed() > BUDGET_S:
        return

    # ---- stage 2: diffuser step, 256px --------------------------------------
    # Reference per-GPU config is b16 (`code_diffuser_train.py:251-253`) but
    # grads flow through the full 1024px decoder — ~37GB of activations,
    # which barely fit the A100-40GB and cannot fit a 16GB v5e chip. The
    # b8 row is the largest fitting plain per-chip batch; the accum row is
    # the REFERENCE-EQUIVALENT per-chip optimizer batch 16 via 2-microbatch
    # gradient accumulation (BASELINE config (3)).
    from vspbfr_tpu.train.diffuser_train import (DiffuserTrainConfig,
                                                 DiffuserTrainer)
    size2 = 256 if not SMOKE else 64

    def try_stage2(b2, accum=1, key_name="stage2", dtype=None):
        # own frame: on exception every device buffer here is dropped
        # with the frame before the next (smaller-batch) attempt
        pipe2 = RestorationPipeline(size=size2, decoder_size=dec)
        trainer2 = DiffuserTrainer(
            DiffuserTrainConfig(size=size2, batch=b2 * accum,
                                grad_accum=accum, compute_dtype=dtype),
            pipe2)
        state, frozen2 = jax.jit(trainer2.init_states)(jax.random.key(0))
        low2 = jax.random.uniform(
            jax.random.key(1), (b2 * accum, size2, size2, 3),
            minval=-1.0, maxval=1.0)
        real2 = jax.random.uniform(jax.random.key(2), low2.shape,
                                   minval=-1.0, maxval=1.0)
        jit2 = jax.jit(trainer2.train_step, donate_argnums=(0,))
        c2 = jit2.lower(state, frozen2, low2, real2,
                        jax.random.key(3)).compile()
        _log(f"stage2 step compiled (b{b2}x{accum})")

        def run2(n):
            nonlocal state
            t0 = time.perf_counter()
            for i in range(n):
                state, m = c2(state, frozen2, low2, real2,
                              jax.random.key(20 + i))
            flush(m)
            return time.perf_counter() - t0

        run2(1)
        n = 6
        dt2 = (run2(2 + n) - run2(2)) / n
        fl2 = _cost_flops(c2)
        dt_name = "bf16+f32-islands" if dtype else "f32"
        cfg_note = (f"b{b2}x{accum}accum/chip {size2}px {dt_name} "
                    "(reference per-GPU b16, code_diffuser_train.py:249-273)"
                    if accum > 1 else
                    f"b{b2}/chip {size2}px {dt_name} (reference global b16,"
                    " code_diffuser_train.py:249-273)")
        out[key_name] = {
            "config": cfg_note,
            "step_ms": round(dt2 * 1e3, 1),
            "imgs_per_sec": round(b2 * accum / dt2, 2),
            "flops": fl2,
            "mfu": (round(fl2 / dt2 / (_peak_flops()
                                       / (1 if dtype else 2)), 4)
                    if fl2 else None),
        }
        _log(f"{key_name}: {dt2*1e3:.1f} ms/step at b{b2}x{accum}")

    done = False
    for b2 in ((8, 4) if not SMOKE else (4,)):
        try:
            try_stage2(b2)
            done = b2
            break
        except Exception as e:  # noqa: BLE001 — try the smaller batch
            _log(f"stage2 b{b2} failed: {type(e).__name__}: {str(e)[:120]}")
            out["stage2"] = {"error": str(e)[:200]}
            del e
            gc.collect()
            jax.clear_caches()
    # reference-equivalent optimizer batch 16 = b8 x 2 microbatches
    if done and _elapsed() < BUDGET_S:
        try:
            gc.collect()
            jax.clear_caches()
            try_stage2(8 if not SMOKE else 4, accum=2,
                       key_name="stage2_accum16")
        except Exception as e:  # noqa: BLE001
            _log(f"stage2 accum failed: {type(e).__name__}: {str(e)[:120]}")
            out["stage2_accum16"] = {"error": str(e)[:200]}
            del e
            gc.collect()
            jax.clear_caches()
    # bf16 decode island (DiffuserTrainConfig.compute_dtype)
    if done and _elapsed() < BUDGET_S:
        try:
            gc.collect()
            jax.clear_caches()
            try_stage2(done, key_name="stage2_bf16", dtype="bfloat16")
        except Exception as e:  # noqa: BLE001
            _log(f"stage2 bf16 failed: {type(e).__name__}: {str(e)[:120]}")
            out["stage2_bf16"] = {"error": str(e)[:200]}
            del e
            gc.collect()
            jax.clear_caches()
    # reference-equivalent optimizer batch 16 in bf16 (VERDICT r4 #5):
    # first try the plain b16 step — bf16 halves the decoder-activation
    # residency, so optimizer-batch 16 may fit WITHOUT accumulation;
    # fall back to the b8 x 2 accumulation form
    if done and not SMOKE and _elapsed() < BUDGET_S:
        for b2, accum, name in ((16, 1, "stage2_bf16_b16"),
                                (8, 2, "stage2_bf16_accum16")):
            try:
                gc.collect()
                jax.clear_caches()
                try_stage2(b2, accum=accum, key_name=name,
                           dtype="bfloat16")
                break  # one optimizer-batch-16 bf16 row is enough
            except Exception as e:  # noqa: BLE001
                _log(f"{name} failed: {type(e).__name__}: {str(e)[:120]}")
                out[name] = {"error": str(e)[:200]}
                del e
                gc.collect()
                jax.clear_caches()


def bench_stage3(flush, out, compute_dtype, key_name):
    """One stage-3 GAN-step measurement at the reference config
    (b4/chip, 512px) in the given training dtype (None = f32)."""
    import gc

    import numpy as np

    from vspbfr_tpu.pipeline import RestorationPipeline
    from vspbfr_tpu.train.restore_train import (RestoreTrainConfig,
                                                RestoreTrainer)
    size, dec = (SIZE, DEC_SIZE)
    batch = BATCH
    pipe = RestorationPipeline(size=size, decoder_size=dec)
    trainer = RestoreTrainer(
        RestoreTrainConfig(size=size, batch=batch,
                           compute_dtype=compute_dtype), pipe)
    g_state, d_state, g_ema, frozen = jax.jit(trainer.init_states)(
        jax.random.key(0))
    g_ema = jax.tree.map(lambda x: jnp.asarray(np.array(x)), g_ema)
    low = jax.random.uniform(jax.random.key(1), (batch, size, size, 3),
                             minval=-1.0, maxval=1.0)
    real = jax.random.uniform(jax.random.key(2), low.shape,
                              minval=-1.0, maxval=1.0)

    # AOT-compile the two phases (same graphs jit_step builds) so
    # cost_analysis is available and nothing compiles twice
    jit_d = jax.jit(trainer.d_phase, donate_argnums=(0,))
    jit_g = jax.jit(trainer.g_phase, donate_argnums=(0, 1))
    args_d = (d_state, g_state.params, jnp.zeros((), jnp.int32), frozen,
              low, real, jax.random.key(3))
    cd = jit_d.lower(*args_d).compile()
    _log("stage3 D phase compiled")
    d2, clean, feats, d_metrics, _ = cd(*args_d)
    args_g = (g_state, g_ema, d2.params, frozen, low, real, clean, feats,
              jax.random.key(4))
    cg = jit_g.lower(*args_g).compile()
    _log("stage3 G phase compiled")
    # the shape-probe execution above donated the original d_state buffers;
    # continue the timing chain from the returned state
    d_state = d2

    def step(g_state, d_state, g_ema, g_step, key):
        k_d, k_g = jax.random.split(key)
        d_state, clean, feats, d_m, _ = cd(
            d_state, g_state.params, g_step, frozen, low, real, k_d)
        g_state, g_ema, g_m = cg(g_state, g_ema, d_state.params, frozen,
                                 low, real, clean, feats, k_g)
        return g_state, d_state, g_ema, {**d_m, **g_m}

    def run(n, g_steps):
        nonlocal g_state, d_state, g_ema
        t0 = time.perf_counter()
        for i in range(n):
            g_state, d_state, g_ema, m = step(
                g_state, d_state, g_ema,
                jnp.asarray(g_steps[i % len(g_steps)], jnp.int32),
                jax.random.key(10 + i))
        flush(m)
        return time.perf_counter() - t0

    # g_step is an explicit input to the D phase, so the R1 lax.cond branch
    # is driven directly: plain steps use g_step=1, R1 steps g_step=0
    run(2, [1])  # warm both executables
    n = 6

    def measure(g_steps):
        # chained-run differencing removes dispatch overhead but can go
        # negative on a tunnel hiccup (seen live: -1430 ms); retry once,
        # then fall back to a plain timed run (safe upper bound)
        for _ in range(2):
            dt = (run(2 + n, g_steps) - run(2, g_steps)) / n
            if dt > 0:
                return dt
        return run(n, g_steps) / n

    dt_plain = measure([1])
    # the R1 lax.cond ADDS the double-grad penalty branch to the plain D
    # step, so it cannot be cheaper — clamp noise from the differencing
    dt_r1 = max(measure([0]), dt_plain)
    dt_steady = (15 * dt_plain + dt_r1) / 16
    fl_d, fl_g = _cost_flops(cd), _cost_flops(cg)
    dt_name = "bf16+f32-islands" if compute_dtype else "f32"
    # MFU basis: an f32 step runs matmuls at half the bf16 peak; the
    # mixed step is bf16-dominated, use full peak (conservative)
    peak = _peak_flops() if compute_dtype else _peak_flops() / 2
    out[key_name] = {
        "config": f"b{batch} {size}px {dt_name} "
                  "(restoration_train.py:312-325)",
        "step_ms": round(dt_plain * 1e3, 1),
        "step_ms_r1": round(dt_r1 * 1e3, 1),
        "step_ms_steady": round(dt_steady * 1e3, 1),
        "imgs_per_sec": round(batch / dt_steady, 2),
        "flops": (fl_d + fl_g) if fl_d and fl_g else None,
        "mfu": (round((fl_d + fl_g) / dt_plain / peak, 4)
                if fl_d and fl_g else None),
    }
    _log(f"{key_name}: {dt_plain*1e3:.1f} ms plain, {dt_r1*1e3:.1f} ms r1")
    del g_state, d_state, g_ema, frozen, cd, cg, args_d, args_g, d2, clean, \
        feats, d_metrics
    gc.collect()


def bench_loader(stage3_step_ms: float | None):
    """Input-pipeline feed rate vs device demand (SURVEY.md §7 starvation
    risk). Three rows:

      host:   the all-CPU chain (native C++ engine) at the stage-3 default
              n_degraded=1 (the reference computes a second chain it never
              consumes, `dataset.py:302-303` vs `restoration_train.py:160`),
              with a worker-scaling curve up to the core count;
      host_n2: the strict-fidelity n_degraded=2 rate (one point);
      device_offload: the TPU-offloaded loader (data/device_degrade.py) —
              host does image decode + small-size JPEG only; blur/resize/
              noise ride the chip. Sustained rate is measured with the lq
              flush INCLUDED (single-chip device time counted), so it is a
              conservative bound for an 8-chip host where the degradation
              shards across chips.

    feeds_8chip_host = best measured rate >= demand, demand = 32 imgs /
    stage-3 steady step."""
    import numpy as np
    from PIL import Image
    import tempfile

    from vspbfr_tpu.data.datasets import DataLoader, RestoreTrainDataset

    size, batch = (SIZE, BATCH) if not SMOKE else (64, 2)
    d = tempfile.mkdtemp(prefix="vspbfr_loaderbench_")
    rng = np.random.default_rng(0)
    for i in range(24):
        # mildly correlated noise compresses like a photo (pure white noise
        # would inflate JPEG decode cost beyond any real dataset)
        base = rng.integers(0, 255, (size // 8, size // 8, 3), np.uint8)
        img = Image.fromarray(base).resize((size + 38, size + 38),
                                           Image.Resampling.BILINEAR)
        img.save(os.path.join(d, f"{i:04d}.jpg"), quality=92)

    cores = os.cpu_count() or 1
    nb = 12 if not SMOKE else 4
    out = {"cores": cores}

    def host_rate(n_deg, workers):
        ds = RestoreTrainDataset(root=d, im_size=(size, size),
                                 n_degraded=n_deg)
        dl = DataLoader(ds, batch_size=batch, num_workers=workers,
                        prefetch=4)
        it = dl.forever()
        next(it)  # warm: thread spin-up, native lib load
        t0 = time.perf_counter()
        n = 0
        for _ in range(nb):
            n += next(it)[-1].shape[0]
        return n / (time.perf_counter() - t0), ds._native is not None

    # host chain, n_degraded=1, worker curve (threads release the GIL in
    # the native engine; scaling is core-bound on this host)
    curve = {}
    native = True
    for w in sorted({1, 2, min(4, cores), min(8, cores)}):
        r, native = host_rate(1, w)
        curve[str(w)] = round(r, 2)
        _log(f"loader host n1 w{w}: {r:.1f} imgs/s")
    best_host = max(curve.values())
    out["host"] = {
        "engine": "native-c++" if native else "numpy",
        "n_degraded": 1, "workers_curve": curve,
        "sustained_imgs_per_sec": best_host,
    }
    r2, _ = host_rate(2, min(2, cores))
    out["host_n2"] = {"n_degraded": 2, "sustained_imgs_per_sec": round(r2, 2)}
    _log(f"loader host n2: {r2:.1f} imgs/s")

    # device-offloaded loader: the WHOLE chain (incl. the JPEG round-trip
    # core, data/device_jpeg.py) is one device dispatch per batch; the
    # host keeps image decode + param sampling only, and the single
    # interconnect transfer is the u8 GT upload the train step needs
    # anyway (lq and gt come back device-resident).
    best = best_host
    try:
        from vspbfr_tpu.data.device_degrade import (DeviceDegradeLoader,
                                                    _GTView, sample_params)
        ds = RestoreTrainDataset(root=d, im_size=(size, size), n_degraded=1)
        dl = DeviceDegradeLoader(ds, batch, num_workers=min(4, cores),
                                 lookahead=2)
        it = dl.forever()
        lq, _ = next(it)  # warm: chain compile + thread spin-up
        np.asarray(lq)
        t0 = time.perf_counter()
        n = 0
        for _ in range(nb):
            lq, gt = next(it)
            np.asarray(jnp.sum(lq) + jnp.sum(gt))  # full completion
            n += gt.shape[0]
        dev_rate = n / (time.perf_counter() - t0)

        # itemize: host-side sample cost (decode + params + kernel SVD)
        view = _GTView(ds)
        t0 = time.perf_counter()
        for i in range(3 * batch):
            gt_u8, seed = view.sample(i)
        from vspbfr_tpu.data.device_degrade import factor_kernels
        p = sample_params(np.random.default_rng(0), batch, size, ds.config)
        factor_kernels(p.kernels)
        host_ms = (time.perf_counter() - t0) / (3 * batch) * 1e3

        # device compute alone: chained dispatches on a RESIDENT gt (no
        # upload) — what an N-chip host pays per chip / N
        gt_res = jnp.asarray(np.stack([view.sample(i)[0]
                                       for i in range(batch)]))
        seeds = np.arange(batch, dtype=np.uint32)
        reps = 6
        dl.dd.degrade_batch_device(gt_res, p, seeds)  # warm
        t0 = time.perf_counter()
        for _ in range(reps):
            lq_d, gt_d = dl.dd.degrade_batch_device(gt_res, p, seeds)
        np.asarray(jnp.sum(lq_d) + jnp.sum(gt_d))
        dev_ms = (time.perf_counter() - t0) / reps / batch * 1e3

        # interconnect: bytes/img (u8 upload) + measured bandwidth of
        # this environment (tunneled TPU here; PCIe on a real host)
        up = np.zeros((batch, size, size, 3), np.uint8)
        jnp.asarray(up).block_until_ready()
        t0 = time.perf_counter()
        for i in range(4):
            h = jnp.asarray(up)
        np.asarray(jnp.sum(h))
        bw = 4 * up.nbytes / (time.perf_counter() - t0) / 1e6
        out["device_offload"] = {
            "sustained_imgs_per_sec": round(dev_rate, 2),
            "host_ms_per_img": round(host_ms, 2),
            "device_compute_ms_per_img": round(dev_ms, 2),
            "upload_bytes_per_img": int(up.nbytes / batch),
            "interconnect_mb_per_s_measured": round(bw, 1),
            "note": "host_ms is the per-core feed constraint; device "
                    "compute shards across the host's chips; the u8 "
                    "upload is the batch transfer ANY loader pays and "
                    "runs at PCIe rates on a non-tunneled host",
        }
        _log(f"loader device-offload: {dev_rate:.1f} imgs/s sustained, "
             f"host {host_ms:.1f} ms/img, device {dev_ms:.2f} ms/img, "
             f"link {bw:.0f} MB/s")
        best = max(best, dev_rate)
        out["device_offload"]["host_rate_imgs_per_sec"] = round(
            1e3 / host_ms, 1)
    except Exception as e:  # noqa: BLE001
        out["device_offload"] = {"error": str(e)[:200]}
        _log(f"device-offload loader failed: {type(e).__name__}: {e}")

    out["sustained_imgs_per_sec"] = round(best, 2)
    if stage3_step_ms:
        # demand for an 8-chip host at the reference's batch-4/chip config
        demand = 4 * 8 / (stage3_step_ms / 1e3)
        out["device_demand_imgs_per_sec_8chip_host"] = round(demand, 2)
        # the production feed constraint: per-core host rate (SURVEY §7's
        # named risk) and the device compute it schedules; the measured
        # sustained row above additionally carries THIS environment's
        # tunneled-interconnect cost, itemized in device_offload
        do = out.get("device_offload", {})
        host_rate = do.get("host_rate_imgs_per_sec", 0.0)
        dev_ms = do.get("device_compute_ms_per_img")
        dev_rate8 = (8e3 / dev_ms) if dev_ms else 0.0  # sharded over 8 chips
        cap = min(max(best, host_rate * cores), dev_rate8 or best)
        # measured vs projected kept SEPARATE (round-4 advisor finding):
        # the boolean headline is what this box actually sustained; the
        # host_rate*cores / device-sharded capacity model is a projection
        # for a real (multi-core, PCIe-attached) 8-chip host and says so.
        out["feeds_8chip_host"] = bool(best >= demand)
        out["feeds_8chip_host_projected"] = bool(cap >= demand)
        out["feeds_note"] = (
            f"measured sustained {best} (includes this box's tunnel-link "
            f"cost, itemized above) vs demand {demand:.1f}; projected "
            f"cap=min(host {host_rate}x{cores}core, device-sharded "
            f"{dev_rate8:.0f}) assumes linear worker scaling "
            "(see host.workers_curve) and cross-chip degrade sharding")
    return out


def stage_split(pipe, params, low, flush, e2e_dt, e2e_flops=None):
    """Latency attribution by compiled-prefix diffs: jit the pipeline cut
    after encode / ddpm / decode (pipeline.restore(upto=...) — the same
    traced path as the full graph), time each, and report diffs. Unlike
    per-stage re-jits, the diffs sum to the end-to-end time by
    construction (round-2's stage_ms summed to 134% of e2e)."""
    import numpy as np  # noqa: F401

    def timeit(fn, n=6):
        def r(k):
            out = None
            t0 = time.perf_counter()
            for i in range(k):
                out = fn(jax.random.key(50 + i))
            flush(out)
            return time.perf_counter() - t0
        r(2)
        return (r(2 + n) - r(2)) / n

    # prefix cuts: encode and decode only. The DDPM stage is too small
    # (~0.1 ms) to difference reliably over the tunnel (BENCH_r03 shipped
    # stage_ms.ddpm = -0.49) — time it DIRECTLY as its own tiny jit on the
    # encode prefix's latent instead, and charge the decode stage with
    # prefix(decode) - prefix(encode) - ddpm_direct so the table still
    # sums to the end-to-end time by construction.
    cuts = ("encode", "decode")
    times, flops = {}, {}
    comps = {}
    for cut in cuts:
        comp = jax.jit(
            lambda p, x, k, c=cut: pipe.restore(p, x, k, upto=c)).lower(
            params, low, jax.random.key(0)).compile()
        comps[cut] = comp
        # tunnel stalls inflate individual chains (r4 saw encode=23.8 and
        # 15.7 vs a true ~6): time each prefix as the MIN of two
        # independent chained runs (timings are lower-bounded by truth)
        times[cut] = min(timeit(lambda k, c=comp: c(params, low, k)),
                         timeit(lambda k, c=comp: c(params, low, k)))
        flops[cut] = _cost_flops(comp)
        _log(f"prefix {cut}: {times[cut]*1e3:.2f} ms")
    # and retry on residual non-monotonicity (encode < decode < e2e)
    for _ in range(2):
        if times["encode"] < times["decode"] < e2e_dt * 1.05:
            break
        for cut in cuts:
            t2 = timeit(lambda k, c=comps[cut]: c(params, low, k))
            times[cut] = min(times[cut], t2)
            _log(f"prefix {cut} (retry): {times[cut]*1e3:.2f} ms")

    # direct DDPM: the 4-step latent chain alone. The stage is ~0.1 ms —
    # below the tunnel's per-call dispatch floor — so run REPS chained
    # stage instances inside ONE jit (x_{i+1} = ddpm(x_i); the data
    # dependency serializes them) and divide.
    latent = comps["encode"](params, low, jax.random.key(0))
    REPS = 32

    def ddpm_many(p, lat, k):
        def body(x, key):
            return pipe.diffuse_latent(p, x, key), None
        out, _ = jax.lax.scan(body, lat, jax.random.split(k, REPS))
        return out

    comp_ddpm = jax.jit(ddpm_many).lower(
        params, latent, jax.random.key(0)).compile()
    t_ddpm = max(timeit(lambda k: comp_ddpm(params, latent, k), n=4),
                 0.0) / REPS
    fl = _cost_flops(comp_ddpm)
    fl_ddpm = fl / REPS if fl else None
    _log(f"direct ddpm: {t_ddpm*1e3:.3f} ms")

    split = {
        "encode": round(times["encode"] * 1e3, 2),
        "ddpm": round(t_ddpm * 1e3, 3),
        "decode": round(max(times["decode"] - times["encode"] - t_ddpm,
                            0.0) * 1e3, 2),
        "restore": round(max(e2e_dt - times["decode"], 0.0) * 1e3, 2),
    }
    split["sum_check"] = {
        "prefix_sum_ms": round(e2e_dt * 1e3, 2),
        "note": "ddpm timed directly; decode = decode_prefix - "
                "encode_prefix - ddpm; restore = e2e - decode_prefix",
    }
    stage_flops = {}
    if flops["encode"] is not None:
        stage_flops["encode"] = flops["encode"]
        if fl_ddpm is not None:
            stage_flops["ddpm"] = fl_ddpm
        if flops["decode"] is not None:
            stage_flops["decode"] = (flops["decode"] - flops["encode"]
                                     - (fl_ddpm or 0.0))
            if e2e_flops:
                stage_flops["restore"] = e2e_flops - flops["decode"]
    if stage_flops:
        # per-stage MFU basis for the roofline (ROOFLINE.md): diffed
        # cost_analysis flops over diffed wall-clock
        peak = _peak_flops()

        def mfus():
            return {c: round(stage_flops[c] / max(split[c], 1e-3)
                             * 1e3 / peak, 4)
                    for c in stage_flops}

        split["stage_mfu"] = mfus()
        # sanity gate (round-4 shipped stage_mfu.decode = 2.004 from a
        # tunnel stall): MFU > 1 is physically impossible — the wall-time
        # denominator is corrupt. Re-measure the prefixes once (min with
        # prior, so truth can only improve), recompute the diffs; if still
        # impossible, mark those rows invalid instead of shipping garbage.
        for attempt in range(2):
            bad = [c for c, v in split["stage_mfu"].items()
                   if v > 1.0 or v < 0.0]
            if not bad:
                break
            if attempt == 0:
                _log(f"stage MFU sanity gate tripped ({bad}); re-measuring")
                for cut in cuts:
                    times[cut] = min(
                        times[cut],
                        timeit(lambda k, c=comps[cut]: c(params, low, k)))
                split["encode"] = round(times["encode"] * 1e3, 2)
                split["decode"] = round(
                    max(times["decode"] - times["encode"] - t_ddpm, 0.0)
                    * 1e3, 2)
                split["restore"] = round(
                    max(e2e_dt - times["decode"], 0.0) * 1e3, 2)
                split["stage_mfu"] = mfus()
            else:
                split["invalid_stages"] = bad
                for c in bad:
                    split["stage_mfu"][c] = None
                _log(f"stage rows {bad} marked invalid (MFU out of range "
                     "after re-measure)")
    return split


if __name__ == "__main__":
    main()
