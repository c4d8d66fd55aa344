from .mesh import (
    make_mesh,
    set_active_mesh,
    active_mesh,
    batch_pointcloud_spec,
    replicated_spec,
    shard_batch,
    replicate_params,
)

__all__ = [
    "make_mesh",
    "set_active_mesh",
    "active_mesh",
    "batch_pointcloud_spec",
    "replicated_spec",
    "shard_batch",
    "replicate_params",
]
