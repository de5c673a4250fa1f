from vspbfr_tpu.parallel.mesh import (
    DataParallel,
    create_mesh,
    local_batch_slice,
    replicated,
    batch_sharded,
)

__all__ = [
    "DataParallel",
    "create_mesh",
    "local_batch_slice",
    "replicated",
    "batch_sharded",
]
