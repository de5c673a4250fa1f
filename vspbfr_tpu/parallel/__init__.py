from vspbfr_tpu.parallel.mesh import (
    DataParallel,
    create_mesh,
    create_mesh_2d,
    local_batch_slice,
    maybe_initialize_distributed,
    model_param_specs,
    process_barrier,
    replicated,
    batch_sharded,
    spatial_sharded,
)

__all__ = [
    "DataParallel",
    "create_mesh",
    "create_mesh_2d",
    "local_batch_slice",
    "maybe_initialize_distributed",
    "model_param_specs",
    "process_barrier",
    "replicated",
    "batch_sharded",
    "spatial_sharded",
]
