"""Mesh / sharding helpers (data parallelism over ICI, multi-host over DCN,
coil tensor parallelism + cascade pipeline parallelism for VarNet,
spatial halo-exchange sharding for 3-D volumes)."""

from .mesh import (
    make_mesh, make_recon_mesh, replicate, shard_batch_spec,
    volume_affine_shards, distributed_init, host_major_grid,
    make_multihost_mesh,
)
from .spatial import conv3d_depth_sharded, conv3d_stack_depth_sharded
from .pipeline import gpipe, stack_cascade_params, varnet_apply_pipelined

__all__ = [
    "make_mesh", "make_recon_mesh", "replicate", "shard_batch_spec",
    "volume_affine_shards", "distributed_init", "host_major_grid",
    "make_multihost_mesh",
    "conv3d_depth_sharded", "conv3d_stack_depth_sharded",
    "gpipe", "stack_cascade_params", "varnet_apply_pipelined",
]
