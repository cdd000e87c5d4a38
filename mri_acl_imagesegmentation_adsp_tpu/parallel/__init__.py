"""Mesh / sharding helpers (data parallelism over ICI, multi-host over DCN)."""

from .mesh import (
    make_mesh, replicate, shard_batch_spec, volume_affine_shards,
    distributed_init, host_major_grid, make_multihost_mesh,
)

__all__ = [
    "make_mesh", "replicate", "shard_batch_spec", "volume_affine_shards",
    "distributed_init", "host_major_grid", "make_multihost_mesh",
]
