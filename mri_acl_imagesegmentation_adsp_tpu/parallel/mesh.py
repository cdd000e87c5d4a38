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

from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]), (axis,))


def make_recon_mesh(n_data: int, n_coil: int,
                    axes: Tuple[str, str] = ("data", "coil")) -> Mesh:
    """2-D (data, coil) mesh for tensor-parallel VarNet reconstruction.

    Batch shards over ``axes[0]``, the coil dimension of k-space /
    sensitivity maps over ``axes[1]`` (recon.varnet.VarNet mesh layout).
    On real hardware place the coil axis on the mesh minor dim so the
    per-cascade coil-combine psum rides nearest-neighbor ICI links.
    Pick ``n_coil`` to DIVIDE the dataset's coil count: non-divisible
    dims fall back to replication (divisible_spec), which silently
    loses the coil parallelism (correctness is unaffected)."""
    devs = jax.devices()
    need = n_data * n_coil
    if len(devs) < need:
        raise ValueError(f"requested {need} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:need]).reshape(n_data, n_coil), axes)


# ---------------------------------------------------------------------------
# Multi-host (DCN) path — SURVEY.md §2.2/§5.8: jax.distributed.initialize +
# a process-aware mesh whose outer axis crosses hosts (collectives on it ride
# DCN) and whose inner axis stays within each host's ICI domain.
# ---------------------------------------------------------------------------

def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Flag-gated multi-host runtime init.

    No-op (returns False) unless num_processes > 1 — single-host runs never
    touch jax.distributed. Arguments default to the JAX_* environment
    (coordinator from JAX_COORDINATOR_ADDRESS etc.), matching how a pod
    launcher provisions processes. Returns True once initialized.
    """
    import os
    if num_processes is None:
        env = os.getenv("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if not num_processes or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    return True


def host_major_grid(devices: Sequence, num_hosts: int) -> np.ndarray:
    """(num_hosts, devices_per_host) grid of devices, host-major.

    Pure assignment math (unit-testable without hardware): devices are
    ordered by (process_index, id) so each ROW is one host's local devices.
    A Mesh built on this grid puts the outer axis across hosts (DCN) and
    the inner axis within a host (ICI) — the layout jax's
    create_hybrid_device_mesh produces for 1-D-per-domain meshes.
    """
    devs = sorted(devices, key=lambda d: (d.process_index, d.id))
    if len(devs) % num_hosts:
        raise ValueError(
            f"{len(devs)} devices do not split over {num_hosts} hosts")
    per_host = len(devs) // num_hosts
    grid = np.empty((num_hosts, per_host), dtype=object)
    for i, d in enumerate(devs):
        row = i // per_host
        if d.process_index != devs[row * per_host].process_index:
            raise ValueError("devices of one host are not contiguous; "
                             "uneven per-host device counts are unsupported")
        grid[row, i % per_host] = d
    return grid


def make_multihost_mesh(axes: Tuple[str, str] = ("hosts", "data")) -> Mesh:
    """2-D (hosts, data) mesh over all global devices.

    Shard batches over BOTH axes (``P(("hosts", "data"))``) for pure data
    parallelism — gradient psums then reduce hierarchically: within-host
    partials over ICI, one cross-host combine over DCN.
    """
    devs = jax.devices()
    num_hosts = max(d.process_index for d in devs) + 1
    return Mesh(host_major_grid(devs, num_hosts), axes)


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def divisible_spec(mesh: Mesh, shape: Sequence[int], spec: P) -> P:
    """``spec`` with axis names dropped from dims they do not divide.

    GSPMD requires every sharded dim to divide evenly by its mesh-axis
    extent; a dim that does not (a batch-1 init probe on a 2-way data
    axis, 6 coils on a 4-way coil axis) falls back to replication on that
    dim — numerically identical, just less parallel. Tuple entries
    (multi-axis dims) are kept only if the dim divides the full product.
    """
    size = dict(zip(mesh.axis_names, mesh.devices.shape))
    out = []
    for i, entry in enumerate(spec):
        if entry is None or i >= len(shape):
            out.append(None)
            continue
        names = entry if isinstance(entry, tuple) else (entry,)
        total = int(np.prod([size[n] for n in names]))
        out.append(entry if shape[i] % total == 0 else None)
    return P(*out)


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
