"""Image grid dumping for visual training checkpoints
(`restoration_train.py:278-288`, `code_diffuser_train.py:214-231`)."""

from __future__ import annotations

import numpy as np
from PIL import Image


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[-1, 1] float -> uint8."""
    return np.clip((np.asarray(img, np.float32) + 1.0) * 127.5, 0, 255).astype(np.uint8)


def save_image_grid(path: str, rows: list[np.ndarray]) -> None:
    """Save a grid: each element of `rows` is a (B, H, W, 3) batch rendered
    as one row of the grid."""
    rendered = []
    for row in rows:
        rendered.append(np.concatenate([to_uint8(x) for x in row], axis=1))
    grid = np.concatenate(rendered, axis=0)
    Image.fromarray(grid).save(path)
