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


_async_ckptr = None


def _async_checkpointer():
    global _async_ckptr
    if _async_ckptr is None:
        import orbax.checkpoint as ocp
        _async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _async_ckptr


def save_checkpoint(path: str, tree: Any, overwrite: bool = True,
                    async_save: bool = False) -> None:
    """Save a pytree (params/states/metadata) to `path` (a directory).

    async_save=True returns as soon as the tree is snapshotted to host
    memory and writes to disk in a background thread (orbax
    AsyncCheckpointer), so the train loop never stalls on I/O — the TPU
    upgrade over the reference's blocking `torch.save` every 500 iters
    (`restoration_train.py:291-305`). A new save waits for the previous one;
    call `wait_for_saves()` before exiting."""
    path = os.path.abspath(path)
    tree = jax.tree.map(np.asarray, jax.device_get(tree))
    if async_save:
        _async_checkpointer().save(path, tree, force=overwrite)
    else:
        _checkpointer().save(path, tree, force=overwrite)


def wait_for_saves() -> None:
    """Block until any in-flight async checkpoint save has committed."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def load_checkpoint(path: str, target: Any | None = None) -> Any:
    """Restore a pytree; `target` (optional) provides structure/dtypes."""
    path = os.path.abspath(path)
    if target is not None:
        target = jax.tree.map(np.asarray, jax.device_get(target))
    return _checkpointer().restore(path, item=target)
