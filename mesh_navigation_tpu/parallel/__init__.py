from mesh_navigation_tpu.parallel.sharded import (
    ShardedMeshWeights,
    make_device_mesh,
    shard_weights,
    sharded_field_solve,
)
from mesh_navigation_tpu.parallel.partition import (
    MeshPartition,
    build_partition,
    partitioned_field_solve,
)
from mesh_navigation_tpu.parallel import distributed

__all__ = [
    "ShardedMeshWeights",
    "make_device_mesh",
    "shard_weights",
    "sharded_field_solve",
    "MeshPartition",
    "build_partition",
    "partitioned_field_solve",
    "distributed",
]
