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
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars are honoured (on CPU the
    cross-process collective layer is gloo, jax's default). No-op when
    single-process or already initialized."""
    import os
    # NOTE: do not probe jax.process_count() here — it initializes the local
    # backend, after which distributed.initialize can no longer take effect.
    if jax.distributed.is_initialized():
        return
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS")
    if not addr:
        return
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    try:
        if nproc is not None and pid is not None:
            jax.distributed.initialize(coordinator_address=addr,
                                       num_processes=int(nproc),
                                       process_id=int(pid))
        else:
            jax.distributed.initialize()  # cluster auto-detection
    except RuntimeError:
        pass  # already initialized by the runtime


def process_barrier(name: str = "barrier", timeout_ms: int = 1_200_000) -> None:
    """Cross-process barrier through the distributed coordinator — the
    reference's `distributed.synchronize()` (`distributed.py:19-35`). Unlike
    a collective (psum/sync_global_devices) this never touches the device
    collective layer, so it is safe to call BEFORE the first collective —
    e.g. to align processes after skewed compile times so the gloo/ICI
    context handshake (default 30 s) cannot time out. No-op single-process."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed as _dist
    client = _dist.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def create_mesh(n_devices: int | None = None, axis: str = "data",
                devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the first n) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def create_mesh_2d(n_data: int, n_model: int,
                   axes: tuple[str, str] = ("data", "model"),
                   devices=None) -> Mesh:
    """2-D mesh: data-parallel x model/spatial-parallel.

    Goes beyond the reference's DDP-only scaling (SURVEY.md §2.6): the
    second axis serves either Megatron-style weight sharding
    (`model_param_specs`) or spatial partitioning of the conv activations
    (`spatial_sharded` — GSPMD inserts the halo exchanges), both of which
    the reference's NCCL runtime has no counterpart for. On a real pod lay
    the model axis innermost so its (chattier) collectives ride ICI."""
    if devices is None:
        devices = jax.devices()
    n = n_data * n_model
    return Mesh(np.asarray(devices[:n]).reshape(n_data, n_model), axes)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_sharded(mesh: Mesh, axis: str = "model",
                    batch_axis: str | None = "data") -> NamedSharding:
    """Shard NHWC activations over H (and optionally batch over the data
    axis): P(batch_axis, axis). For convolutions XLA/GSPMD lowers this to
    per-shard convs + k-1-row halo exchanges — rows, not feature maps, so
    the communication volume is tiny relative to channel-sharded TP. The
    natural scale-out for the big 512/1024px conv stages."""
    if batch_axis is not None and batch_axis in mesh.axis_names:
        return NamedSharding(mesh, P(batch_axis, axis))
    return NamedSharding(mesh, P(None, axis))


def model_param_specs(tree: Any, mesh: Mesh, axis: str = "model",
                      min_size: int = 256) -> Any:
    """Megatron-style weight sharding specs for an arbitrary param pytree:
    shard the LAST axis (conv Co / dense out-features) over `axis` when it
    divides evenly and is at least min_size; replicate everything else
    (biases, styles, small heads). GSPMD propagates the activation
    shardings and inserts the all-gathers/reduce-scatters — no model-code
    changes, exactly the "annotate and let XLA insert collectives" recipe.

    Works for optimizer states too (moments mirror param shapes), so a
    whole TrainState can be placed with one tree.map."""
    n = mesh.shape[axis]
    repl = NamedSharding(mesh, P())

    def spec(x):
        shape = getattr(x, "shape", ())
        if len(shape) >= 2 and shape[-1] >= min_size and shape[-1] % n == 0:
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 1) + [axis])))
        return repl

    return jax.tree.map(spec, tree)


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
        """Place a host pytree with device-sharded leading batch axes.

        Single-process: device_put of the full batch. Multi-process: each
        process passes its LOCAL batch shard (global_batch / process_count
        rows, `local_batch_slice` / the dataset's shard_index — the
        reference's DistributedSampler semantics) and the shards are
        assembled into one global jax.Array."""
        sh = batch_sharded(self.mesh, self.axis)
        if jax.process_count() == 1:
            return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), tree)

    def replicate(self, tree: Any) -> Any:
        """Replicate a (host- or process-local) pytree over the whole mesh.

        Multi-process: every process must pass the same values (e.g. params
        initialized from the same PRNG key), mirroring DDP's requirement
        that ranks start from identical weights."""
        sh = replicated(self.mesh)
        if jax.process_count() == 1:
            return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), tree)

    def batch_spec(self) -> NamedSharding:
        return batch_sharded(self.mesh, self.axis)

    def replicated_spec(self) -> NamedSharding:
        return replicated(self.mesh)
