"""Device-mesh parallelism: the TPU-native replacement for the reference's
DDP/NCCL runtime (`distributed.py`, `restoration_train.py:344-373,430-445`).

The reference's only strategy is data parallelism (SURVEY.md §2.6). Here that
is expressed declaratively: one `Mesh` with a "data" axis, batch arrays
sharded over it, params replicated, and the jitted train step annotated with
`NamedSharding`s — XLA inserts the gradient all-reduces over ICI that DDP's
backward hooks did over NCCL. The `distributed.py` helper surface maps to:

  get_rank / get_world_size  -> jax.process_index / mesh size (trivial)
  synchronize                -> unnecessary (XLA program order)
  reduce_sum                 -> jnp sum under jit over sharded arrays, or
                                lax.psum inside shard_map (ADA's rt stat)
  reduce_loss_dict           -> loss scalars come out of the jitted step
                                already globally averaged
  DistributedSampler         -> local_batch_slice (per-host dataset shard)
  DDP(broadcast_buffers=..., find_unused_parameters=...) -> nonexistent:
                                whole-graph grad over replicated params
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> None:
    """Multi-host bring-up: replaces the reference's SLURM rank math + NCCL
    env rendezvous (`restoration_train.py:344-373`). On TPU pods JAX
    auto-detects everything; elsewhere the standard JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars are honoured. No-op when
    single-process or already initialized."""
    import os
    if jax.process_count() > 1:
        return  # already initialized
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
            "MEGASCALE_COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize()
        except RuntimeError:
            pass  # already initialized by the runtime


def create_mesh(n_devices: int | None = None, axis: str = "data",
                devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the first n) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def local_batch_slice(global_batch: int, process_index: int | None = None,
                      process_count: int | None = None) -> slice:
    """Per-host shard of a global batch (DistributedSampler equivalent)."""
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    per = global_batch // process_count
    return slice(process_index * per, (process_index + 1) * per)


@dataclasses.dataclass
class DataParallel:
    """Convenience bundle: mesh + shardings + placement helpers."""

    mesh: Mesh
    axis: str = "data"

    @property
    def n_devices(self) -> int:
        return self.mesh.devices.size

    def shard_batch(self, tree: Any) -> Any:
        """Place a host pytree with device-sharded leading batch axes."""
        sh = batch_sharded(self.mesh, self.axis)
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

    def replicate(self, tree: Any) -> Any:
        sh = replicated(self.mesh)
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

    def batch_spec(self) -> NamedSharding:
        return batch_sharded(self.mesh, self.axis)

    def replicated_spec(self) -> NamedSharding:
        return replicated(self.mesh)
