from mesh_navigation_tpu.parallel.sharded import (
    ShardedMeshWeights,
    make_device_mesh,
    shard_weights,
    sharded_field_solve,
)

__all__ = [
    "ShardedMeshWeights",
    "make_device_mesh",
    "shard_weights",
    "sharded_field_solve",
]
