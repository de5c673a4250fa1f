"""Stage-3 restoration GAN training CLI (the `restoration_train.py` driver).

Flags mirror `restoration_train.py:310-342`; the loop body lives in one
jitted mesh-sharded step (vspbfr_tpu.train.restore_train). Checkpoints are
orbax dirs written every --save_inter steps, overwriting a fixed name like
the reference (`checkpoint/a_restore_model.pt` -> <out>/checkpoint/restore).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from vspbfr_tpu.cli.common import wire_loss_nets
from vspbfr_tpu.data import DataLoader, RestoreTrainDataset
from vspbfr_tpu.losses.ada import ADAState
from vspbfr_tpu.parallel import DataParallel, create_mesh
from vspbfr_tpu.parallel.mesh import maybe_initialize_distributed
from vspbfr_tpu.pipeline import RestorationPipeline
from vspbfr_tpu.train.restore_train import RestoreTrainConfig, RestoreTrainer
from vspbfr_tpu.utils import (Logger, load_checkpoint, save_checkpoint,
                              wait_for_saves)
from vspbfr_tpu.utils.images import save_image_grid


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--path", type=str, required=True, help="training images")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--iter", type=int, default=500_000)
    p.add_argument("--batch", type=int, default=4, help="per-device batch")
    p.add_argument("--lr", type=float, default=0.002)
    p.add_argument("--r1", type=float, default=10.0)
    p.add_argument("--d_reg_every", type=int, default=16)
    p.add_argument("--g_reg_every", type=int, default=4)
    p.add_argument("--mixing", type=float, default=0.5)
    p.add_argument("--train_dtype", choices=("f32", "bf16"), default="f32",
                   help="bf16 = mixed precision (bf16 G/D compute, f32 "
                        "params/opt/logits/R1/loss nets; 1.29x step, "
                        "loss curves within f32 noise — BF16_TRAIN_r4."
                        "json). f32 = the reference's dtype")
    p.add_argument("--n_degraded", type=int, default=1, choices=(1, 2),
                   help="degradation chains per sample. The reference "
                        "computes 2 but CONSUMES only the first "
                        "(`dataset.py:302-303` vs `restoration_train.py:"
                        "160`) — default 1 skips the dead chain (~2x host "
                        "CPU); pass 2 for strict loader fidelity")
    p.add_argument("--loader", choices=("auto", "device", "host"),
                   default="auto",
                   help="'device' offloads blur/resize/noise to the TPU "
                        "(data/device_degrade.py), leaving the host only "
                        "image decode + small-size JPEG; 'host' runs the "
                        "full chain on CPU (native C++ engine when built); "
                        "'auto' = device on TPU backends")
    p.add_argument("--jpeg", choices=("device", "host"), default="device",
                   help="with --loader device: 'device' simulates the "
                        "JPEG lossy core on-chip (data/device_jpeg.py, "
                        "approx rounding, golden-bounded); 'host' keeps "
                        "libjpeg-exact compression on CPU while the "
                        "blur/resize/noise offload stays on the TPU")
    p.add_argument("--percept_loss_weight", type=float, default=0.5)
    p.add_argument("--id_loss_weight", type=float, default=0.1)
    p.add_argument("--augment", action="store_true")
    p.add_argument("--augment_p", type=float, default=0.0,
                   help="fixed augmentation probability; 0 = adaptive "
                        "(`restoration_train.py:138-141`)")
    p.add_argument("--channel_multiplier", type=int, default=2,
                   help="StyleGAN2 channel multiplier (config-f = 2)")
    p.add_argument("--ada_target", type=float, default=0.6)
    p.add_argument("--ada_length", type=int, default=500 * 1000)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--psp_ckpt", type=str, default=None,
                   help="converted style_encoder_decoder params (orbax)")
    p.add_argument("--diffuser_ckpt", type=str, default=None)
    p.add_argument("--lpips_ckpt", type=str, default=None,
                   help="converted LPIPS VGG16+lin params "
                        "(cli.convert_ckpt lpips)")
    p.add_argument("--arcface_ckpt", type=str, default=None,
                   help="converted ArcFace resnet101 params "
                        "(cli.convert_ckpt arcface)")
    p.add_argument("--out", type=str, default="train_out")
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
    p.add_argument("--debug", action="store_true")
    return p


def full_ckpt_tree(g_state, d_state, g_ema, ada_state, key, it):
    """Everything the reference persists (`restoration_train.py:291-305`)
    — params, BOTH optimizer states, EMA, ada_p — plus the RNG cursor so a
    resumed run continues the exact same stochastic stream."""
    tree = {
        "g": g_state.params, "g_opt": g_state.opt_state,
        "g_step": g_state.step,
        "d": d_state.params, "d_opt": d_state.opt_state,
        "d_step": d_state.step,
        "g_ema": g_ema,
        "rng": jax.random.key_data(key),
        "iter": it,
    }
    if ada_state is not None:
        tree["ada"] = ada_state._asdict()
    return tree


def restore_full_ckpt(path, g_state, d_state, g_ema, ada_state, key):
    """Full-fidelity resume (`restoration_train.py:411-428`); falls back to
    params-only for legacy checkpoints. Returns the restored
    (g_state, d_state, g_ema, ada_state, key, start_iter)."""
    template = full_ckpt_tree(g_state, d_state, g_ema, ada_state, key, 0)
    try:
        ck = load_checkpoint(path, target=template)
        g_state = g_state.replace(params=ck["g"], opt_state=ck["g_opt"],
                                  step=ck["g_step"])
        d_state = d_state.replace(params=ck["d"], opt_state=ck["d_opt"],
                                  step=ck["d_step"])
        g_ema = ck["g_ema"]
        key = jax.random.wrap_key_data(jnp.asarray(ck["rng"]))
        if ada_state is not None and "ada" in ck:
            ada_state = ADAState(**jax.tree.map(jnp.asarray, ck["ada"]))
    except Exception as e:  # legacy params-only checkpoint
        import warnings
        warnings.warn(
            f"full-state restore failed ({type(e).__name__}: {e}); "
            "falling back to params-only resume (optimizer moments, "
            "ada_p and RNG cursor re-initialized)")
        ck = load_checkpoint(path)
        g_state = g_state.replace(
            params=ck["g"], opt_state=g_state.tx.init(ck["g"]))
        d_state = d_state.replace(
            params=ck["d"], opt_state=d_state.tx.init(ck["d"]))
        g_ema = ck["g_ema"]
    return g_state, d_state, g_ema, ada_state, key, int(ck.get("iter", 0))


def main(argv=None) -> None:
    from vspbfr_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    if args.debug:
        args.save_inter, args.show_inter = 20, 200

    cfg = RestoreTrainConfig(
        size=args.size, batch=args.batch, lr=args.lr, r1=args.r1,
        d_reg_every=args.d_reg_every, g_reg_every=args.g_reg_every,
        percept_weight=args.percept_loss_weight,
        id_weight=args.id_loss_weight, mixing=args.mixing,
        augment=args.augment, augment_p=args.augment_p,
        ada_target=args.ada_target,
        ada_length=args.ada_length,
        compute_dtype="bfloat16" if args.train_dtype == "bf16" else None)
    pipe = RestorationPipeline(size=args.size, mixing_prob=args.mixing,
                               decoder_size=args.decoder_size,
                               channel_multiplier=args.channel_multiplier,
                               packed_min_res=args.packed_min_res)
    trainer = RestoreTrainer(cfg, pipe)

    maybe_initialize_distributed()
    mesh = create_mesh()
    dp = DataParallel(mesh)
    n_dev = dp.n_devices
    global_batch = args.batch * n_dev
    print(f"devices={n_dev} global_batch={global_batch}")

    g_state, d_state, g_ema, frozen = jax.jit(trainer.init_states)(
        jax.random.key(args.seed))
    # distinct buffers for the EMA copy (donation-safe)
    g_ema = jax.tree.map(lambda x: jnp.asarray(np.array(x)), g_ema)
    start_iter = 0
    key = jax.random.key(args.seed + 1)
    ada_state = ADAState.create() if args.augment else None
    if args.ckpt:
        g_state, d_state, g_ema, ada_state, key, start_iter = \
            restore_full_ckpt(args.ckpt, g_state, d_state, g_ema,
                              ada_state, key)
    if args.psp_ckpt:
        frozen = {**frozen, "psp": load_checkpoint(args.psp_ckpt)}
    if args.diffuser_ckpt:
        frozen = {**frozen,
                  "diffuser": load_checkpoint(args.diffuser_ckpt)["diffuser"]}
    frozen = wire_loss_nets(frozen, args.lpips_ckpt, args.arcface_ckpt,
                            args.percept_loss_weight, args.id_loss_weight)

    g_state, d_state, g_ema, frozen = dp.replicate(
        (g_state, d_state, g_ema, frozen))
    if ada_state is not None:
        ada_state = dp.replicate(ada_state)

    step = trainer.jit_step(mesh)
    sample_fn = jax.jit(lambda p, low, rng: pipe.restore(p, low, rng))
    use_device_loader = (args.loader == "device"
                         or (args.loader == "auto"
                             and jax.default_backend() != "cpu"))
    ds = RestoreTrainDataset(args.path, im_size=(args.size, args.size),
                             n_degraded=args.n_degraded, seed=args.seed)
    if use_device_loader:
        from vspbfr_tpu.data.device_degrade import DeviceDegradeLoader
        loader = DeviceDegradeLoader(ds, global_batch, seed=args.seed,
                                     jpeg=args.jpeg,
                                     shard_index=jax.process_index(),
                                     shard_count=jax.process_count())
    else:
        loader = DataLoader(ds, global_batch, seed=args.seed,
                            shard_index=jax.process_index(),
                            shard_count=jax.process_count())
    # rank-0-only observability + persistence, like the reference's
    # `get_rank() == 0` gates (`restoration_train.py:258,278,291`)
    is_lead = jax.process_index() == 0
    logger = Logger(args.out) if is_lead else None
    ckpt_dir = os.path.join(args.out, "checkpoint", "restore")
    # inference-ready export (the reference ships one .pt that
    # `restoration_test.py:239-250` reads g_ema from; ours is the orbax
    # tree `cli/infer.py --ckpt` consumes directly: psp + diffuser +
    # generator/g_ema in the pipeline layout)
    pipe_dir = os.path.join(args.out, "checkpoint", "restore_pipeline")

    def pipeline_export():
        return {"psp": frozen["psp"], "diffuser": frozen["diffuser"],
                "generator": g_state.params, "g_ema": g_ema}

    if start_iter == 0:
        # init-state export: the baseline `cli/infer.py` comparison point
        save_checkpoint(os.path.join(args.out, "checkpoint",
                                     "restore_pipeline_init"),
                        jax.device_get(pipeline_export()), async_save=True)

    from vspbfr_tpu.utils.runtime import GracefulShutdown
    stop = GracefulShutdown()

    it = start_iter
    # resume the deterministic data stream where it left off
    start_epoch, start_batch = divmod(start_iter, loader.batches_per_epoch())
    for batch in loader.forever(start_epoch, start_batch):
        if it >= args.iter or stop.requested:
            break
        # host loader: (lq1[, lq2], gt); device loader: (lq, gt). Only
        # lq1 + gt are consumed either way (`restoration_train.py:160`).
        lq1, gt = batch[0], batch[-1]
        lq1, gt = dp.shard_batch((jnp.asarray(lq1), jnp.asarray(gt)))
        key, sub = jax.random.split(key)
        if args.augment:
            g_state, d_state, g_ema, metrics, ada_state = step(
                g_state, d_state, g_ema, frozen, lq1, gt, sub, ada_state)
        else:
            g_state, d_state, g_ema, metrics = step(
                g_state, d_state, g_ema, frozen, lq1, gt, sub)
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
            # visual checkpoint with the EMA generator
            # (`restoration_train.py:278-288`). Computed by EVERY process —
            # the inputs are global arrays, and multi-controller JAX
            # requires all processes to execute ops on them; only the PNG
            # write is rank-0.
            from jax.experimental import multihost_utils as mhu
            sample = sample_fn(
                {"psp": frozen["psp"], "diffuser": frozen["diffuser"],
                 "generator": g_ema},
                lq1[:4], jax.random.key(it))
            imgs = [mhu.process_allgather(x, tiled=True)
                    for x in (lq1[:4], sample, gt[:4])]
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
            save_checkpoint(ckpt_dir, jax.device_get(full_ckpt_tree(
                g_state, d_state, g_ema, ada_state, key, it)),
                async_save=True)
            save_checkpoint(pipe_dir, jax.device_get(pipeline_export()),
                            async_save=True)
    wait_for_saves()
    if stop.requested and is_lead:
        print(f"[shutdown] checkpoint committed at iter {it}", flush=True)


if __name__ == "__main__":
    main()
