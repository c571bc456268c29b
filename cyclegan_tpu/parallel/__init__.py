"""Device-mesh parallelism utilities."""

from cyclegan_tpu.parallel.mesh import (
    create_mesh,
    replicate,
    shard_batch,
)

__all__ = ["create_mesh", "shard_batch", "replicate"]
