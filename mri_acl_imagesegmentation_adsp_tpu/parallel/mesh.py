"""Device mesh + sharding utilities.

The reference's only distributed machinery is vendored PyTorch-Lightning DDP
(SURVEY.md §2.2): DistributedSampler batch sharding, a volume-affine
VolumeSampler for validation, NCCL all-reduce for gradients and
DistributedMetricSum for metrics. The TPU-native equivalents here:

  - one ``jax.sharding.Mesh`` over the chips with a "data" axis;
  - batch sharding via ``NamedSharding(P("data"))`` constraints inside the
    jitted step (XLA inserts the gradient all-reduce over ICI itself — there
    is no NCCL to manage);
  - metric reduction: metrics are computed on global-view arrays inside jit,
    so sums/means ARE the cross-chip reduction;
  - volume-affine sharding: ``volume_affine_shards`` assigns whole volumes
    to shards round-robin with pad-to-max, replacing VolumeSampler
    (zip!DL_reconstruction/data/volume_sampler.py:16-113).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]), (axis,))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_spec(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Batch-dim sharding for an ndim-rank array."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def volume_affine_shards(vol_sizes: Sequence[int], n_shards: int
                         ) -> List[np.ndarray]:
    """Assign whole volumes to shards, round-robin by size-descending order,
    then pad each shard's slice-index list to the max length by repeating
    its first entries (the VolumeSampler contract: every slice of a volume
    stays on one shard; equal counts per shard; duplicates are deduped at
    aggregation time by (volume, slice) key)."""
    sizes = np.asarray(vol_sizes)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    order = np.argsort(-sizes, kind="stable")  # big volumes first
    buckets: List[List[int]] = [[] for _ in range(n_shards)]
    loads = np.zeros(n_shards, np.int64)
    for v in order:
        tgt = int(np.argmin(loads))
        buckets[tgt].extend(range(starts[v], starts[v] + sizes[v]))
        loads[tgt] += sizes[v]
    max_len = max(len(b) for b in buckets)
    out = []
    for b in buckets:
        arr = np.asarray(b, np.int64)
        if len(arr) < max_len:
            pad = np.resize(arr, max_len - len(arr))
            arr = np.concatenate([arr, pad])
        out.append(arr)
    return out
