from .mesh import (
    make_mesh,
    batch_pointcloud_spec,
    replicated_spec,
    shard_batch,
    replicate_params,
)

__all__ = [
    "make_mesh",
    "batch_pointcloud_spec",
    "replicated_spec",
    "shard_batch",
    "replicate_params",
]
