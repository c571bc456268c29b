"""Device-mesh parallelism utilities."""

from cyclegan_tpu.parallel.mesh import (
    create_mesh,
    create_mesh_2d,
    replicate,
    shard_batch,
)

__all__ = ["create_mesh", "create_mesh_2d", "shard_batch", "replicate"]
