from tpu_mednet.parallel.mesh import (
    DATA_AXIS,
    SPACE_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    spatial_sharding,
    train_batch_sharding,
)

__all__ = [
    "DATA_AXIS",
    "SPACE_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "spatial_sharding",
    "shard_batch",
    "train_batch_sharding",
]
