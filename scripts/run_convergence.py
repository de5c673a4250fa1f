"""End-to-end convergence run (VERDICT r4 #2): stage-2 then stage-3 through
the PRODUCTION CLIs with the device loader on the real chip, followed by
held-out eval with `cli/infer.py` at init vs trained.

Demonstrates the composed system LEARNS — the reference's implicit
contract (`restoration_train.py:101-305`, `code_diffuser_train.py:95-244`)
that no prior round exercised beyond 120 steps:

  stage 2: diffuser L1 trending down over `--s2_iters` steps;
  stage 3: GAN training in the healthy band, LPIPS/ID terms falling,
           ADA's p adapting (augment on, shortened ada_length);
  eval:    held-out PSNR/SSIM improving over the init checkpoint, and
           sample grids visibly restored.

Dataset: `scripts/make_face_dataset.py` crops from the reference's teaser
figures (the only real face pixels in this image). Frozen nets are
random-init (no released checkpoints in the image, PARITY.md) — the
restoration signal comes from the degraded-image path + GAN/perceptual
losses, which is exactly what this run validates.

Usage (TPU, several 10s of minutes):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_convergence.py \
      [--root runs] [--s2_iters 2000] [--s3_iters 4000] [--size 256]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(args_list, log_path, extra_env=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    if extra_env:
        env.update(extra_env)
    t0 = time.perf_counter()
    print(f"$ {' '.join(args_list)}", flush=True)
    with open(log_path, "w") as f:
        p = subprocess.run(args_list, env=env, cwd=REPO, stdout=f,
                           stderr=subprocess.STDOUT)
    dt = time.perf_counter() - t0
    print(f"  -> rc={p.returncode} ({dt:.0f}s), log {log_path}", flush=True)
    if p.returncode != 0:
        print(open(log_path).read()[-4000:])
        raise RuntimeError(f"{args_list[2]} failed rc={p.returncode}")
    return dt


def parse_train_log(path):
    """Logger lines: `[step] [k]:v [k]:v ... [t]:epoch`."""
    curves = {}
    for line in open(path):
        m = re.match(r"\[(\d+)\] (.*)", line)
        if not m:
            continue
        step = int(m.group(1))
        for k, v in re.findall(r"\[([\w_]+)\]:([-\d.e+naif]+)", m.group(2)):
            if k == "t":
                continue
            curves.setdefault(k, []).append((step, float(v)))
    return curves


def parse_eval(path):
    """infer.py prints `name: n=16 psnr=... ssim=...`."""
    for line in open(path):
        m = re.match(r"\w+: n=(\d+) (.*)", line)
        if m:
            d = dict(kv.split("=") for kv in m.group(2).split())
            return {k: float(v) for k, v in d.items()}
    return None


def thin(series, n=120):
    if len(series) <= n:
        return series
    stride = max(1, len(series) // n)
    out = series[::stride]
    if out[-1] != series[-1]:
        out.append(series[-1])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="runs")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--decoder_size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--s2_iters", type=int, default=2000)
    ap.add_argument("--s3_iters", type=int, default=4000)
    ap.add_argument("--ada_length", type=int, default=20000)
    ap.add_argument("--skip_s2", action="store_true")
    ap.add_argument("--skip_s3", action="store_true")
    args = ap.parse_args()

    root = os.path.join(REPO, args.root)
    faces = os.path.join(root, "faces")
    s2_out = os.path.join(root, "conv_s2")
    s3_out = os.path.join(root, "conv_s3")
    os.makedirs(root, exist_ok=True)
    if not os.path.isdir(os.path.join(faces, "train")):
        sh([sys.executable, os.path.join(REPO, "scripts",
                                         "make_face_dataset.py"),
            "--out", faces], os.path.join(root, "make_faces.log"))

    record = {"config": vars(args), "wall_s": {}}

    # ---- stage 2: code diffuser (`code_diffuser_train.py` semantics) ----
    if not args.skip_s2:
        record["wall_s"]["stage2"] = sh(
            [sys.executable, "-m", "vspbfr_tpu.cli.train_diffuser",
             "--path", os.path.join(faces, "train"),
             "--size", str(args.size), "--batch", str(args.batch),
             "--iter", str(args.s2_iters), "--train_dtype", "bf16",
             "--decoder_size", str(args.decoder_size),
             "--save_inter", "500", "--show_inter", "500",
             "--out", s2_out], os.path.join(root, "stage2.log"))
    record["stage2_curves"] = {
        k: thin(v) for k, v in parse_train_log(
            os.path.join(s2_out, "train.log")).items()}

    # ---- stage 3: restoration GAN, consuming stage 2's diffuser + psp ----
    if not args.skip_s3:
        record["wall_s"]["stage3"] = sh(
            [sys.executable, "-m", "vspbfr_tpu.cli.train_restore",
             "--path", os.path.join(faces, "train"),
             "--size", str(args.size), "--batch", str(args.batch),
             "--iter", str(args.s3_iters), "--train_dtype", "bf16",
             "--decoder_size", str(args.decoder_size),
             "--augment", "--ada_length", str(args.ada_length),
             "--psp_ckpt", os.path.join(s2_out, "checkpoint", "psp"),
             "--diffuser_ckpt",
             os.path.join(s2_out, "checkpoint", "code_diffuser"),
             "--save_inter", "1000", "--show_inter", "500",
             "--out", s3_out], os.path.join(root, "stage3.log"))
    record["stage3_curves"] = {
        k: thin(v) for k, v in parse_train_log(
            os.path.join(s3_out, "train.log")).items()}

    # ---- held-out eval: init vs trained through cli/infer.py ----
    evals = {}
    for tag, ckpt in (("init", "restore_pipeline_init"),
                      ("trained", "restore_pipeline")):
        out_dir = os.path.join(root, f"eval_{tag}")
        log = os.path.join(root, f"eval_{tag}.log")
        sh([sys.executable, "-m", "vspbfr_tpu.cli.infer",
            "--lq_dirs", os.path.join(faces, "eval_lq"),
            "--hq_dirs", os.path.join(faces, "eval_hq"),
            "--names", "heldout",
            "--ckpt", os.path.join(s3_out, "checkpoint", ckpt),
            "--size", str(args.size),
            "--decoder_size", str(args.decoder_size),
            "--bf16", "--out", out_dir], log)
        evals[tag] = parse_eval(log)
    record["eval"] = evals

    path = os.path.join(root, "CONVERGENCE_r5.json")
    with open(path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({"eval": evals, "wall_s": record["wall_s"]}))
    print(f"record -> {path}")


if __name__ == "__main__":
    main()
