"""Device-mesh parallelism utilities."""

from cyclegan_tpu.parallel.mesh import (
    create_mesh,
    create_mesh_2d,
    replicate,
    shard_batch,
)
from cyclegan_tpu.parallel.spatial import (
    create_spatial_mesh,
    make_spatial_forward,
    shard_spatial,
    spatial_shardings,
)

__all__ = [
    "create_mesh",
    "create_mesh_2d",
    "shard_batch",
    "replicate",
    "create_spatial_mesh",
    "make_spatial_forward",
    "shard_spatial",
    "spatial_shardings",
]
