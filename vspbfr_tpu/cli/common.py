"""Shared CLI plumbing for the trainer drivers."""

from __future__ import annotations

import warnings
from typing import Any

from vspbfr_tpu.utils import load_checkpoint


def wire_loss_nets(frozen: dict[str, Any], lpips_ckpt: str | None,
                   arcface_ckpt: str | None, percept_weight: float,
                   id_weight: float) -> dict[str, Any]:
    """Substitute converted loss-net weights into the frozen param dict.

    The reference builds LPIPS from vendored calibrated weights
    (`my_lpips/dist_model.py:61-73`) and the ID loss from `Arcface.pth`
    (`Loss/id_loss.py:13-15`). Training with randomly initialized loss nets
    optimizes against a meaningless perceptual metric, so we warn loudly
    when a weight is active without a checkpoint.

    Checkpoints come from `cli.convert_ckpt lpips` / `... arcface`, which
    store the params under "lpips" / "id" respectively.
    """
    if lpips_ckpt:
        frozen = {**frozen, "lpips": load_checkpoint(lpips_ckpt)["lpips"]}
    elif percept_weight > 0:
        warnings.warn(
            "percept_loss_weight > 0 but no --lpips_ckpt: the LPIPS net is "
            "RANDOMLY initialized, so the perceptual loss is meaningless. "
            "Convert torchvision VGG16 + my_lpips lin weights with "
            "`python -m vspbfr_tpu.cli.convert_ckpt lpips ...` and pass "
            "--lpips_ckpt.", stacklevel=2)
    if arcface_ckpt:
        frozen = {**frozen, "id": load_checkpoint(arcface_ckpt)["id"]}
    elif id_weight > 0:
        warnings.warn(
            "id_loss_weight > 0 but no --arcface_ckpt: the ArcFace net is "
            "RANDOMLY initialized, so the ID loss is meaningless. Convert "
            "Arcface.pth with `python -m vspbfr_tpu.cli.convert_ckpt "
            "arcface ...` and pass --arcface_ckpt.", stacklevel=2)
    return frozen
