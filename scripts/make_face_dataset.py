"""Build a tiny face dataset for convergence runs from the reference's
teaser figures (`/root/reference/imgs/teaser*.png` — the only real face
pixels in this image; no egress, no released datasets).

Extracts clean face tiles from the result-grid figures, augments them
(random resized crops + flips + mild color jitter) into a training set,
and builds a held-out paired eval set (hq + deterministically degraded lq
via vspbfr_tpu.data.degradations, fixed seed) for `cli/infer.py` scoring.

Outputs under --out:
  train/*.jpg       augmented crops (>= --train_size px, q95)
  eval_hq/*.png     held-out crops at --eval_size
  eval_lq/*.png     degraded copies (fixed-seed reference chain)

Usage:
  python scripts/make_face_dataset.py --out /root/repo/runs/faces
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

TEASERS = "/root/reference/imgs"

# Hand-verified face boxes (x0, y0, size) per teaser figure.
# teaser5: 2x8 grid of 137px cells, face = top square of each cell.
T5_CELL = 136.875


def extract_tiles() -> list[Image.Image]:
    tiles = []
    t5 = Image.open(os.path.join(TEASERS, "teaser5.png")).convert("RGB")
    for y0 in (6, 219):   # row face bands per the brightness profile
        for c in range(8):
            x0 = int(round(c * T5_CELL)) + 2
            tiles.append(t5.crop((x0, y0, x0 + 132, y0 + 132)))
    t3 = Image.open(os.path.join(TEASERS, "teaser3.png")).convert("RGB")
    for box in ((10, 235, 160, 385),     # degraded input photo
                (672, 86, 806, 184),     # inverted image
                (696, 252, 792, 360),    # restored
                (985, 250, 1105, 380)):  # ground truth
        tiles.append(t3.crop(box))
    t4 = Image.open(os.path.join(TEASERS, "teaser4.png")).convert("RGB")
    for box in ((14, 14, 112, 110),     # degraded (top left)
                (14, 182, 112, 276)):   # GT (bottom left)
        tiles.append(t4.crop(box))
    return tiles


def augment(rng: np.random.Generator, img: Image.Image,
            out_size: int) -> Image.Image:
    w, h = img.size
    s = min(w, h)
    crop = int(s * rng.uniform(0.82, 1.0))
    x0 = rng.integers(0, w - crop + 1)
    y0 = rng.integers(0, h - crop + 1)
    out = img.crop((x0, y0, x0 + crop, y0 + crop)).resize(
        (out_size, out_size), Image.Resampling.LANCZOS)
    if rng.integers(0, 2):
        out = out.transpose(Image.FLIP_LEFT_RIGHT)
    a = np.asarray(out, np.float32)
    gain = rng.uniform(0.92, 1.08, size=3)
    bias = rng.uniform(-10, 10, size=3)
    a = np.clip(a * gain + bias, 0, 255).astype(np.uint8)
    return Image.fromarray(a)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/faces")
    ap.add_argument("--n_train", type=int, default=320)
    ap.add_argument("--n_eval", type=int, default=16)
    ap.add_argument("--train_size", type=int, default=300,
                    help="stored side; the dataset random-crops to --size")
    ap.add_argument("--eval_size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--preview", action="store_true",
                    help="also dump a tile montage for visual check")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    tiles = extract_tiles()
    for sub in ("train", "eval_hq", "eval_lq"):
        os.makedirs(os.path.join(args.out, sub), exist_ok=True)

    if args.preview:
        m = Image.new("RGB", (136 * 8, 170 * 3), "white")
        for i, t in enumerate(tiles):
            tt = t.copy()
            tt.thumbnail((132, 168))
            m.paste(tt, ((i % 8) * 136, (i // 8) * 170))
        m.save(os.path.join(args.out, "tiles_preview.png"))

    # train: augmented crops, round-robin over tiles
    for i in range(args.n_train):
        img = augment(rng, tiles[i % len(tiles)], args.train_size)
        img.save(os.path.join(args.out, "train", f"{i:05d}.jpg"), quality=95)

    # eval: held-out augmentations (fresh draws — crops the train loop
    # never saw) + deterministic degraded pairs
    from vspbfr_tpu.data.degradations import DegradationConfig, degrade_image
    cfg = DegradationConfig()
    for i in range(args.n_eval):
        hq = augment(rng, tiles[i % len(tiles)], args.eval_size)
        hq.save(os.path.join(args.out, "eval_hq", f"{i:04d}.png"))
        gt = np.asarray(hq, np.float32) / 255.0
        lq = degrade_image(np.random.default_rng(1000 + i), gt, cfg)
        Image.fromarray(
            np.clip(np.round(lq * 255.0), 0, 255).astype(np.uint8)).save(
            os.path.join(args.out, "eval_lq", f"{i:04d}.png"))
    print(f"{len(tiles)} tiles -> {args.n_train} train / {args.n_eval} "
          f"eval pairs under {args.out}")


if __name__ == "__main__":
    main()
