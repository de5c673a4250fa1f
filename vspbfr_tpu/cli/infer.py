"""Batch restoration inference CLI (the `restoration_test.py` product path).

Runs the full pipeline over one or more test datasets, dumps
restored/low/sample/gt PNG quadruples (`restoration_test.py:134-157`), and —
unlike the reference — computes PSNR/SSIM (and LPIPS when weights are given)
in-process via the eval harness.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from vspbfr_tpu.data import DataLoader, RestoreTestDataset
from vspbfr_tpu.evaluation import psnr, ssim
from vspbfr_tpu.pipeline import RestorationPipeline
from vspbfr_tpu.utils import Logger, load_checkpoint


def save_png(path: str, img: np.ndarray) -> None:
    arr = np.clip((np.asarray(img) + 1.0) * 127.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--lq_dirs", nargs="+", required=True,
                   help="low-quality input dirs")
    p.add_argument("--hq_dirs", nargs="+", default=None,
                   help="matching GT dirs ('None' entries allowed)")
    p.add_argument("--names", nargs="+", default=None, help="dataset names")
    p.add_argument("--ckpt", type=str, default=None,
                   help="orbax checkpoint dir with pipeline params")
    p.add_argument("--out", type=str, default="eval_out")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--mixing", type=float, default=0.5,
                   help="latent-mixing probability "
                        "(`restoration_test.py:214`)")
    p.add_argument("--channel_multiplier", type=int, default=2,
                   help="StyleGAN2 channel multiplier (config-f = 2)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--decoder_size", type=int, default=1024,
                   help="frozen StyleGAN2 decoder resolution")
    p.add_argument("--packed_min_res", type=int, default=512,
                   help="space-to-depth layout threshold (0 disables)")
    p.add_argument("--debug", action="store_true",
                   help="truncate each dataset to 10 batches")
    p.add_argument("--save_images", action="store_true", default=True)
    p.add_argument("--lpips_ckpt", default=None,
                   help="converted LPIPS params (cli.convert_ckpt lpips) — "
                        "adds in-process LPIPS scoring")
    p.add_argument("--inception_ckpt", default=None,
                   help="converted InceptionV3 params (cli.convert_ckpt "
                        "inception) — adds standard-FID scoring")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 inference with f32 islands (the bench "
                        "headline dtype): decoder + RestoreNet run bf16, "
                        "weights pre-cast once at load")
    return p


def main(argv=None) -> None:
    from vspbfr_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    pipe = RestorationPipeline(size=args.size,
                               decoder_size=args.decoder_size,
                               mixing_prob=args.mixing,
                               channel_multiplier=args.channel_multiplier,
                               packed_min_res=args.packed_min_res,
                               compute_dtype=jnp.bfloat16 if args.bf16
                               else None)
    if args.ckpt:
        params = load_checkpoint(args.ckpt)
        params = params.get("params", params)
        if "g_ema" in params:  # prefer the EMA generator like the reference
            params = {**params, "generator": params["g_ema"]}
    else:
        print("WARNING: no --ckpt; random weights (smoke-test mode)")
        params = jax.jit(pipe.init_params)(jax.random.key(0))
    params = pipe.prepare_params(params)  # no-op in f32 mode

    @jax.jit
    def restore(params, low, rng):
        # return_sample: the "visual style prompt" StyleGAN2 decode, dumped
        # as *_sample.png like the reference (`restoration_test.py:134-157`)
        return pipe.restore(params, low, rng, return_sample=True)

    hq_dirs = args.hq_dirs or ["None"] * len(args.lq_dirs)
    names = args.names or [f"data{i}" for i in range(len(args.lq_dirs))]
    key = jax.random.key(args.seed)

    lpips_apply = feature_fn = None
    if args.lpips_ckpt:
        from vspbfr_tpu.losses.lpips import LPIPS
        lp = load_checkpoint(args.lpips_ckpt)["lpips"]
        net = LPIPS()
        lpips_apply = jax.jit(
            lambda a, b: net.apply({"params": lp}, a, b))
    if args.inception_ckpt:
        from vspbfr_tpu.losses.inception import make_inception_feature_fn
        feature_fn = make_inception_feature_fn(
            load_checkpoint(args.inception_ckpt)["inception"])

    for lq_root, hq_root, name in zip(args.lq_dirs, hq_dirs, names):
        out_dir = os.path.join(args.out, name)
        os.makedirs(out_dir, exist_ok=True)
        logger = Logger(out_dir, name)
        ds = RestoreTestDataset(lq_root, None if hq_root == "None" else hq_root,
                                im_size=(args.size, args.size))
        loader = DataLoader(ds, args.batch, shuffle=False, drop_last=False,
                            num_workers=4)
        tot_psnr, tot_ssim, tot_lpips, n = 0.0, 0.0, 0.0, 0
        stats_r = stats_g = None
        if feature_fn is not None:
            from vspbfr_tpu.evaluation import FeatureStats
            stats_r, stats_g = FeatureStats(2048), FeatureStats(2048)
        for bi, batch in enumerate(loader.epoch(0)):
            if args.debug and bi >= 10:
                break
            if len(batch) == 3:
                low, gt, fnames = batch
            else:
                low, fnames = batch
                gt = None
            key, sub = jax.random.split(key)
            restored, sample = restore(params, jnp.asarray(low), sub)
            restored = np.asarray(restored)
            sample = np.asarray(sample)
            for j, fname in enumerate(fnames):
                if args.save_images:
                    save_png(os.path.join(out_dir, f"{fname}_restore.png"),
                             restored[j])
                    save_png(os.path.join(out_dir, f"{fname}_low.png"),
                             low[j])
                    save_png(os.path.join(out_dir, f"{fname}_sample.png"),
                             sample[j])
                    if gt is not None:
                        save_png(os.path.join(out_dir, f"{fname}_gt.png"),
                                 gt[j])
            if gt is not None:
                tot_psnr += float(jnp.sum(psnr(jnp.asarray(restored),
                                               jnp.asarray(gt))))
                tot_ssim += float(jnp.sum(ssim(jnp.asarray(restored),
                                               jnp.asarray(gt))))
                if lpips_apply is not None:
                    tot_lpips += float(jnp.sum(lpips_apply(
                        jnp.asarray(restored), jnp.asarray(gt))))
                if stats_r is not None:
                    stats_r.update(np.asarray(feature_fn(
                        jnp.asarray(restored))))
                    stats_g.update(np.asarray(feature_fn(jnp.asarray(gt))))
            n += low.shape[0]
        if n and hq_root != "None":
            scores = {"psnr": tot_psnr / n, "ssim": tot_ssim / n}
            if lpips_apply is not None:
                scores["lpips"] = tot_lpips / n
            if stats_r is not None:
                from vspbfr_tpu.evaluation import frechet_distance
                scores["fid"] = frechet_distance(*stats_r.finalize(),
                                                 *stats_g.finalize())
            logger.log(n, scores)
            print(f"{name}: n={n} " +
                  " ".join(f"{k}={v:.4f}" for k, v in scores.items()))
        else:
            print(f"{name}: n={n} (no GT)")


if __name__ == "__main__":
    main()
