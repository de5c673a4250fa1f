"""Input-pipeline feed-rate benchmark (SURVEY.md §7 starvation risk).

The stage-3 step consumes batch_size images AND runs TWO full 512px
degradation chains per sample (`/root/reference/dataset.py:302-303`). This
measures the sustained loader rate (RestoreTrainDataset + DataLoader, native
C++ engine when built) and prints the worker/host prescription against a
device-demand target.

Usage:
  python scripts/bench_loader.py [--size 512] [--batch 4] [--workers N]
      [--target_ms_per_step 715] [--chips_per_host 8]

The prescription assumes loader workers scale ~linearly with cores until
memory bandwidth (measured: per-worker rate x workers, valid while
workers <= physical cores).
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np


def make_dataset_dir(n_images: int, size: int) -> str:
    """Synthesize a small on-disk image set (the real FFHQ is not in this
    environment); JPEG-decode cost is part of what we are measuring."""
    from PIL import Image
    d = tempfile.mkdtemp(prefix="vspbfr_loaderbench_")
    rng = np.random.default_rng(0)
    for i in range(n_images):
        # mildly correlated noise compresses like a photo (pure white noise
        # would inflate JPEG decode cost beyond any real dataset)
        base = rng.integers(0, 255, (size // 8, size // 8, 3), np.uint8)
        img = Image.fromarray(base).resize((size + 38, size + 38),
                                           Image.Resampling.BILINEAR)
        img.save(os.path.join(d, f"{i:04d}.jpg"), quality=92)
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--workers", type=int, default=min(8, os.cpu_count()))
    ap.add_argument("--n_images", type=int, default=48)
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--target_ms_per_step", type=float, default=715.0,
                    help="device step time the loader must keep up with")
    ap.add_argument("--chips_per_host", type=int, default=8)
    args = ap.parse_args()

    from vspbfr_tpu.data.datasets import DataLoader, RestoreTrainDataset
    from vspbfr_tpu.data import native

    root = make_dataset_dir(args.n_images, args.size)
    ds = RestoreTrainDataset(root=root, im_size=(args.size, args.size),
                             n_degraded=2)
    engine = "native-c++" if ds._native is not None else "numpy"

    # ---- single-sample breakdown (one core) --------------------------------
    rng = np.random.default_rng(0)
    from PIL import Image
    from vspbfr_tpu.data.datasets import _load_rgb, _resize_crop
    t0 = time.perf_counter()
    reps = 6
    for i in range(reps):
        img = _load_rgb(ds.files[i % len(ds.files)])
        img = _resize_crop(img, ds.im_size, rng)
        gt = np.asarray(img, np.float32) / 255.0
    t_load = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for i in range(reps):
        ds._degrade(rng, gt)
    t_degrade = (time.perf_counter() - t0) / reps

    # ---- sustained loader rate ---------------------------------------------
    dl = DataLoader(ds, batch_size=args.batch, num_workers=args.workers,
                    prefetch=4)
    it = dl.forever()
    next(it)  # warm (thread spin-up, native lib load)
    t0 = time.perf_counter()
    n = 0
    for _ in range(args.batches):
        batch = next(it)
        n += batch[-1].shape[0]
    dt = time.perf_counter() - t0
    rate = n / dt

    demand_host = (args.batch / (args.target_ms_per_step / 1e3)
                   * args.chips_per_host)
    cores = os.cpu_count()
    per_worker = rate / min(args.workers, cores)
    print(json.dumps({
        "engine": engine,
        "size": args.size,
        "n_degraded": 2,
        "cores": cores,
        "workers": args.workers,
        "sample_ms": {"load_resize": round(t_load * 1e3, 1),
                      "degrade_x1": round(t_degrade * 1e3, 1),
                      "total_per_sample": round(
                          (t_load + 2 * t_degrade) * 1e3, 1)},
        "sustained_imgs_per_sec": round(rate, 2),
        "imgs_per_sec_per_worker": round(per_worker, 2),
        "device_demand_imgs_per_sec_per_host": round(demand_host, 2),
        "workers_needed_per_host": int(np.ceil(demand_host / per_worker)),
        "feeds_device": bool(rate >= demand_host),
    }))


if __name__ == "__main__":
    main()
