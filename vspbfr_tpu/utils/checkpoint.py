"""Checkpoint save/restore via orbax.

Replaces the reference's `torch.save` of a single overwritten dict every 500
iters (`restoration_train.py:291-305`, `code_diffuser_train.py:233-244`) with
atomic orbax pytree checkpoints. Like the reference, a fixed name is
overwritten by default ("recent"), and the full training state (params,
opt_state, ema, step, config echo) round-trips for resume
(`restoration_train.py:411-428`).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, tree: Any, overwrite: bool = True) -> None:
    """Save a pytree (params/states/metadata) to `path` (a directory)."""
    path = os.path.abspath(path)
    tree = jax.tree.map(np.asarray, jax.device_get(tree))
    _checkpointer().save(path, tree, force=overwrite)


def load_checkpoint(path: str, target: Any | None = None) -> Any:
    """Restore a pytree; `target` (optional) provides structure/dtypes."""
    path = os.path.abspath(path)
    if target is not None:
        target = jax.tree.map(np.asarray, jax.device_get(target))
    return _checkpointer().restore(path, item=target)
