"""Stage-2 code-diffuser training CLI (the `code_diffuser_train.py` driver).

Flags mirror `code_diffuser_train.py:249-273`; loop body is one jitted
mesh-sharded step (vspbfr_tpu.train.diffuser_train). Supports the debug
400-image subset (`code_diffuser_train.py:369-371`).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from vspbfr_tpu.cli.common import wire_loss_nets
from vspbfr_tpu.data import DataLoader, RestoreTrainDataset
from vspbfr_tpu.parallel import DataParallel, create_mesh
from vspbfr_tpu.parallel.mesh import maybe_initialize_distributed
from vspbfr_tpu.pipeline import RestorationPipeline
from vspbfr_tpu.train.diffuser_train import DiffuserTrainConfig, DiffuserTrainer
from vspbfr_tpu.utils import (Logger, load_checkpoint, save_checkpoint,
                              wait_for_saves)
from vspbfr_tpu.utils.images import save_image_grid


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--path", type=str, required=True)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--iter", type=int, default=200_000)
    p.add_argument("--batch", type=int, default=16, help="per-device batch")
    p.add_argument("--lr", type=float, default=0.002)
    p.add_argument("--percept_loss_weight", type=float, default=0.1)
    p.add_argument("--id_loss_weight", type=float, default=0.1)
    p.add_argument("--timesteps", type=int, default=4)
    p.add_argument("--channel_multiplier", type=int, default=2,
                   help="StyleGAN2 channel multiplier (config-f = 2)")
    p.add_argument("--train_dtype", choices=("f32", "bf16"), default="f32",
                   help="bf16 = mixed precision for the image-space "
                        "decode fwd/bwd (the step's dominant cost); the "
                        "latent chain and loss nets stay f32. f32 = the "
                        "reference's dtype")
    p.add_argument("--loader", choices=("auto", "device", "host"),
                   default="auto",
                   help="'device' offloads the degradation chain's dense "
                        "math to the TPU (data/device_degrade.py); 'host' "
                        "runs it on CPU; 'auto' = device on TPU backends")
    p.add_argument("--jpeg", choices=("device", "host"), default="device",
                   help="with --loader device: 'device' simulates the "
                        "JPEG lossy core on-chip (data/device_jpeg.py, "
                        "approx rounding, golden-bounded); 'host' keeps "
                        "libjpeg-exact compression on CPU while the "
                        "blur/resize/noise offload stays on the TPU")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="microbatches per optimizer step; batch is the "
                        "per-device OPTIMIZER batch (e.g. --batch 16 "
                        "--grad_accum 2 runs 2x8 per device — the "
                        "reference's per-GPU 16 on a 16GB chip)")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--psp_ckpt", type=str, default=None)
    p.add_argument("--lpips_ckpt", type=str, default=None,
                   help="converted LPIPS VGG16+lin params "
                        "(cli.convert_ckpt lpips)")
    p.add_argument("--arcface_ckpt", type=str, default=None,
                   help="converted ArcFace resnet101 params "
                        "(cli.convert_ckpt arcface)")
    p.add_argument("--out", type=str, default="diffuser_out")
    p.add_argument("--save_inter", type=int, default=500)
    p.add_argument("--show_inter", type=int, default=2000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--decoder_size", type=int, default=1024,
                   help="frozen StyleGAN2 decoder resolution")
    p.add_argument("--packed_min_res", type=int, default=512,
                   help="space-to-depth layout threshold (0 disables)")
    p.add_argument("--profile", type=int, default=0, metavar="N",
                   help="capture a jax.profiler trace of N steps (after "
                        "warmup) into <out>/trace, viewable in XProf")
    p.add_argument("--debug", action="store_true",
                   help="400-image subset + short intervals")
    return p


def full_ckpt_tree(state, key, it):
    """Params + optimizer state + RNG cursor, the reference's full resume
    payload (`code_diffuser_train.py:233-244`, `:319-337`)."""
    return {
        "diffuser": state.params, "opt": state.opt_state,
        "step": state.step, "rng": jax.random.key_data(key), "iter": it,
    }


def restore_full_ckpt(path, state, key):
    """Returns the restored (state, key, start_iter); params-only fallback
    for legacy checkpoints."""
    template = full_ckpt_tree(state, key, 0)
    try:
        ck = load_checkpoint(path, target=template)
        state = state.replace(params=ck["diffuser"], opt_state=ck["opt"],
                              step=ck["step"])
        key = jax.random.wrap_key_data(jnp.asarray(ck["rng"]))
    except Exception as e:  # legacy params-only checkpoint
        import warnings
        warnings.warn(
            f"full-state restore failed ({type(e).__name__}: {e}); "
            "falling back to params-only resume")
        ck = load_checkpoint(path)
        state = state.replace(params=ck["diffuser"],
                              opt_state=state.tx.init(ck["diffuser"]))
    return state, key, int(ck.get("iter", 0))


def main(argv=None) -> None:
    from vspbfr_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    if args.debug:
        args.save_inter, args.show_inter = 20, 200

    cfg = DiffuserTrainConfig(
        size=args.size, batch=args.batch, lr=args.lr,
        percept_weight=args.percept_loss_weight,
        id_weight=args.id_loss_weight, timesteps=args.timesteps,
        grad_accum=args.grad_accum,
        compute_dtype="bfloat16" if args.train_dtype == "bf16" else None)
    pipe = RestorationPipeline(size=args.size, timesteps=args.timesteps,
                               decoder_size=args.decoder_size,
                               channel_multiplier=args.channel_multiplier,
                               packed_min_res=args.packed_min_res)
    trainer = DiffuserTrainer(cfg, pipe)

    maybe_initialize_distributed()
    mesh = create_mesh()
    dp = DataParallel(mesh)
    global_batch = args.batch * dp.n_devices

    state, frozen = jax.jit(trainer.init_states)(jax.random.key(args.seed))
    start_iter = 0
    key = jax.random.key(args.seed + 1)
    if args.ckpt:
        state, key, start_iter = restore_full_ckpt(args.ckpt, state, key)
    if args.psp_ckpt:
        frozen = {**frozen, "psp": load_checkpoint(args.psp_ckpt)}
    frozen = wire_loss_nets(frozen, args.lpips_ckpt, args.arcface_ckpt,
                            args.percept_loss_weight, args.id_loss_weight)

    state, frozen = dp.replicate((state, frozen))
    step = trainer.jit_step(mesh)

    # visual checkpoint (`code_diffuser_train.py:214-231`): decode the
    # refined latent, the raw degraded-encode latent, and the GT inversion
    def _sample_fn(diff_params, psp_params, low, real, key):
        psp = pipe.psp
        k1, k2, k3, k4 = jax.random.split(key, 4)
        low_lat = psp.get_w_plus(psp_params, low)
        refined = pipe.diffuse_latent(
            {"diffuser": diff_params}, low_lat, k1)
        target = psp.get_w_plus(psp_params, real)
        return (psp.decode(psp_params, refined, noise_rng=k2),
                psp.decode(psp_params, low_lat, noise_rng=k3),
                psp.decode(psp_params, target, noise_rng=k4))

    sample_fn = jax.jit(_sample_fn)

    # stage-2 dataset: single degraded copy, uint8-round-tripped GT, and —
    # unlike stage 3 — NO random grayscale (ImageFolder_restore is built
    # with gray_prob=None, `/root/reference/dataset.py:42`)
    ds = RestoreTrainDataset(args.path, im_size=(args.size, args.size),
                             n_degraded=1, quantize_gt=True, gray_prob=None,
                             seed=args.seed,
                             subset=400 if args.debug else None)
    if args.loader == "device" or (args.loader == "auto"
                                   and jax.default_backend() != "cpu"):
        from vspbfr_tpu.data.device_degrade import DeviceDegradeLoader
        # quantize_gt / gray_prob flow from the dataset's own fields
        loader = DeviceDegradeLoader(ds, global_batch, seed=args.seed,
                                     jpeg=args.jpeg,
                                     shard_index=jax.process_index(),
                                     shard_count=jax.process_count())
    else:
        loader = DataLoader(ds, global_batch, seed=args.seed,
                            shard_index=jax.process_index(),
                            shard_count=jax.process_count())
    # rank-0-only observability + persistence, like the reference's
    # `get_rank() == 0` gates (`code_diffuser_train.py:205,214,233`)
    is_lead = jax.process_index() == 0
    logger = Logger(args.out) if is_lead else None
    ckpt_dir = os.path.join(args.out, "checkpoint", "code_diffuser")
    if start_iter == 0:
        # export the (frozen) psp tree this diffuser is trained against,
        # so stage 3 / inference can consume a CONSISTENT encoder+decoder
        # (--psp_ckpt): the reference guarantees this by shipping one
        # style_encoder_decoder.pt used by all stages
        # (`e4e/models/psp.py:122-143`)
        save_checkpoint(os.path.join(args.out, "checkpoint", "psp"),
                        jax.device_get(frozen["psp"]), async_save=True)

    from vspbfr_tpu.utils.runtime import GracefulShutdown
    stop = GracefulShutdown()

    it = start_iter
    start_epoch, start_batch = divmod(start_iter, loader.batches_per_epoch())
    for batch in loader.forever(start_epoch, start_batch):
        if it >= args.iter or stop.requested:
            break
        lq, gt = batch
        lq, gt = dp.shard_batch((jnp.asarray(lq), jnp.asarray(gt)))
        key, sub = jax.random.split(key)
        state, metrics = step(state, frozen, lq, gt, sub)
        it += 1
        if args.profile:
            # trace a steady-state window (skip the compile + warmup steps)
            if it == start_iter + 4:
                jax.block_until_ready(metrics)
                jax.profiler.start_trace(os.path.join(args.out, "trace"))
            elif it == start_iter + 4 + args.profile:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
        if it % 10 == 0 and is_lead:
            m = {k: float(v) for k, v in metrics.items()}
            logger.log(it, m)
            if it % 100 == 0:
                print(f"[{it}] " + " ".join(f"{k}:{v:.4f}" for k, v in m.items()))
        if it % args.show_inter == 0:
            # computed by EVERY process (global-array inputs require all
            # processes to participate); only the PNG write is rank-0
            import numpy as np
            from jax.experimental import multihost_utils as mhu
            refined, ori, real_inv = sample_fn(
                state.params, frozen["psp"], lq[:4], gt[:4],
                jax.random.key(it))
            imgs = [mhu.process_allgather(x, tiled=True)
                    for x in (lq[:4], refined, ori, real_inv, gt[:4])]
            if is_lead:
                os.makedirs(os.path.join(args.out, "samples"), exist_ok=True)
                save_image_grid(
                    os.path.join(args.out, "samples", f"{it:06d}.png"),
                    [np.asarray(x) for x in imgs])
        if it % args.save_inter == 0 or stop.requested:
            # non-blocking: disk write overlaps the next train steps. Every
            # process calls save (orbax saves are collective — internal
            # barriers + primary-host-only writing). On a preemption signal
            # this is the final state — at most one step is lost.
            save_checkpoint(
                ckpt_dir, jax.device_get(full_ckpt_tree(state, key, it)),
                async_save=True)
    wait_for_saves()
    if stop.requested and is_lead:
        print(f"[shutdown] checkpoint committed at iter {it}", flush=True)


if __name__ == "__main__":
    main()
