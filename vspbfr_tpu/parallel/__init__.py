from vspbfr_tpu.parallel.mesh import (
    DataParallel,
    create_mesh,
    local_batch_slice,
    maybe_initialize_distributed,
    process_barrier,
    replicated,
    batch_sharded,
)

__all__ = [
    "DataParallel",
    "create_mesh",
    "local_batch_slice",
    "maybe_initialize_distributed",
    "process_barrier",
    "replicated",
    "batch_sharded",
]
