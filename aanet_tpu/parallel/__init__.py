"""Device-mesh parallelism utilities."""

from aanet_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    batch_sharding,
    replicated_sharding,
)
from aanet_tpu.parallel.spatial import (
    image_sharding,
    make_spatial_forward,
    shard_images,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "batch_sharding",
    "replicated_sharding",
    "image_sharding",
    "make_spatial_forward",
    "shard_images",
]
