from leaf_tpu.parallel.mesh import (
    create_mesh,
    replicate,
    shard_batch,
    local_batch_slice,
)

__all__ = ["create_mesh", "replicate", "shard_batch", "local_batch_slice"]
