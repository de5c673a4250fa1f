"""Convert the reference's released torch checkpoints to orbax param dirs.

  python -m vspbfr_tpu.cli.convert_ckpt psp --torch style_encoder_decoder.pt --out ckpts/psp
  python -m vspbfr_tpu.cli.convert_ckpt diffuser --torch code_diffuser.pt --out ckpts/diffuser
  python -m vspbfr_tpu.cli.convert_ckpt restore --torch restoration_net.pt --out ckpts/restore
  python -m vspbfr_tpu.cli.convert_ckpt arcface --torch Arcface.pth --out ckpts/arcface
  python -m vspbfr_tpu.cli.convert_ckpt lpips --torch vgg16_torchvision.pth \
      --lin my_lpips/weights/v0.1/vgg.pth --out ckpts/lpips
  python -m vspbfr_tpu.cli.convert_ckpt inception --torch inception_v3_torchvision.pth \
      --out ckpts/inception

Checkpoint layouts per `restoration_test.py:31-40`, `:239-250`,
`e4e/models/psp.py:122-143`, `Loss/id_loss.py:13-15`.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from vspbfr_tpu.convert import (
    convert_code_diffuser,
    convert_discriminator,
    convert_lpips,
    convert_psp_checkpoint,
    convert_resnet101,
    convert_restoration_net,
    load_torch_state_dict,
)
from vspbfr_tpu.convert.torch_import import sub_state_dict
from vspbfr_tpu.utils import save_checkpoint


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("kind", choices=["psp", "diffuser", "restore", "arcface",
                                    "lpips", "inception"])
    p.add_argument("--torch", dest="torch_path", required=True)
    p.add_argument("--lin", default=None, help="LPIPS lin weights (lpips only)")
    p.add_argument("--out", required=True)
    p.add_argument("--size", type=int, default=512)
    args = p.parse_args(argv)

    jax.config.update("jax_platforms", "cpu")
    key = jax.random.key(0)

    if args.kind == "psp":
        from vspbfr_tpu.models.psp import PSPFacade
        psp = PSPFacade.create(out_size=args.size, size=1024)
        flax0 = psp.init_params(key)
        params = convert_psp_checkpoint(psp, flax0, args.torch_path)
    elif args.kind == "diffuser":
        from vspbfr_tpu.models.code_diffuser import CodeDiffuser
        sd = load_torch_state_dict(args.torch_path)
        sd = sub_state_dict(sd, "att_mapper") if any(
            k.startswith("att_mapper.att_mapper") for k in sd) else sd
        # checkpoint stores {"att_mapper": state_dict} (`restoration_test.py:31-40`)
        if "att_mapper" in sd and not hasattr(sd["att_mapper"], "shape"):
            sd = {k: v for k, v in sd["att_mapper"].items()}
        m = CodeDiffuser(timesteps=4)
        lat = jnp.zeros((1, 18, 512))
        flax0 = m.init(key, lat, lat, jnp.zeros((1,), jnp.int32))["params"]
        params = {"diffuser": convert_code_diffuser(flax0, sd)}
    elif args.kind == "restore":
        from vspbfr_tpu.models.restorenet import Discriminator, RestorationNet
        raw = load_torch_state_dict(args.torch_path)
        net = RestorationNet(size=args.size)
        imgs = jnp.zeros((1, args.size, args.size, 3))
        feats = None
        from vspbfr_tpu.pipeline import RestorationPipeline
        pipe = RestorationPipeline(size=args.size)
        feats = pipe._dummy_feats(1)
        flax0 = net.init({"params": key, "noise": key}, imgs, feats,
                         jnp.zeros((1, 18, 512)), jnp.zeros((1, 1, 512)))["params"]
        params = {}
        for name in ("g", "g_ema", "d"):
            if name not in raw:
                continue
            sd = raw[name] if isinstance(raw[name], dict) else None
            if sd is None:
                continue
            sd = {k: (v.numpy() if hasattr(v, "numpy") else v)
                  for k, v in sd.items()}
            if name == "d":
                d = Discriminator(size=args.size)
                dflax0 = d.init(key, imgs)["params"]
                params["d"] = convert_discriminator(dflax0, sd, size=args.size)
            else:
                params[name] = convert_restoration_net(flax0, sd)
    elif args.kind == "arcface":
        from vspbfr_tpu.losses.id_loss import ResNet101Embedder
        sd = load_torch_state_dict(args.torch_path)
        m = ResNet101Embedder()
        flax0 = m.init(key, jnp.zeros((1, 112, 112, 3)))["params"]
        params = {"id": convert_resnet101(flax0, sd)}
    elif args.kind == "lpips":
        from vspbfr_tpu.losses.lpips import LPIPS
        vgg_sd = load_torch_state_dict(args.torch_path)
        lin_sd = load_torch_state_dict(args.lin)
        m = LPIPS()
        z = jnp.zeros((1, 64, 64, 3))
        flax0 = m.init(key, z, z)["params"]
        params = {"lpips": convert_lpips(flax0, vgg_sd, lin_sd)}
    else:  # inception (torchvision inception_v3 -> standard-FID features)
        from vspbfr_tpu.convert.torch_import import convert_inception_v3
        from vspbfr_tpu.losses.inception import InceptionV3Features
        sd = load_torch_state_dict(args.torch_path)
        m = InceptionV3Features()
        flax0 = m.init(key, jnp.zeros((1, 299, 299, 3)))["params"]
        params = {"inception": convert_inception_v3(flax0, sd)}

    save_checkpoint(args.out, params)
    print(f"converted {args.kind} -> {args.out}")


if __name__ == "__main__":
    main()
