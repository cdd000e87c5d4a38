"""Mesh / sharding helpers (data parallelism over ICI)."""

from .mesh import make_mesh, replicate, shard_batch_spec, volume_affine_shards

__all__ = ["make_mesh", "replicate", "shard_batch_spec", "volume_affine_shards"]
