"""Spatial (halo-exchange) sharding for 3-D convolutions.

SURVEY.md §5.7 names this the TPU-native analog of "sequence scaling" for
this codebase: the long axis is the slice/depth axis of a volume, and the
stretch goal is sharding conv feature maps spatially across the mesh with
halo exchange — so a volume larger than one chip's HBM can run 3-D
convolution stacks with each chip holding only its depth band.

Design: the volume is sharded along depth (axis 1 of NDHWC) over the mesh
axis. A SAME conv with kernel depth 3 needs one neighbor plane on each
side of every local band; inside ``shard_map`` each shard sends its edge
planes to its neighbors with ``lax.ppermute`` (one hop over ICI), zeroes
the halos at the volume boundary (== SAME zero padding), and runs a depth-
VALID conv on the haloed band. The result is EXACTLY the unsharded SAME
conv, tested against the single-device oracle on the 8-device CPU mesh.

The reference has no such capability anywhere (its 3-D path crops
160x160x64 ROIs to fit one GPU, src/train/train_unet3d.py:39-54); this is
a capability extension, not a parity item.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:                                      # jax >= 0.4.35 stable path
    from jax import shard_map
except ImportError:                       # older jax
    from jax.experimental.shard_map import shard_map


def _exchange_depth_halos(xl: jnp.ndarray, axis: str, halo: int):
    """Return (from_prev, from_next) halo planes for a local depth band.

    ``xl``: (N, d_local, H, W, C). Each shard sends its top ``halo`` planes
    to the previous shard and its bottom ``halo`` planes to the next; the
    first/last shards receive zeros (SAME zero padding at volume edges)."""
    n = lax.psum(1, axis)
    idx = lax.axis_index(axis)
    fwd = [(i, (i + 1) % n) for i in range(n)]      # i -> i+1 (wraps)
    bwd = [(i, (i - 1) % n) for i in range(n)]
    # what shard i RECEIVES over fwd is shard i-1's bottom planes
    from_prev = lax.ppermute(xl[:, -halo:], axis, fwd)
    from_next = lax.ppermute(xl[:, :halo], axis, bwd)
    from_prev = jnp.where(idx == 0, 0.0, from_prev)       # no upper neighbor
    from_next = jnp.where(idx == n - 1, 0.0, from_next)   # no lower neighbor
    return from_prev, from_next


# jitted shard_map programs keyed by (mesh, axis, per-layer halos): the
# cached closure pins the mesh alive, jit's own cache handles shape/dtype
# variation, and repeat calls are one dispatch instead of a per-op eager
# replay (this backend pays ~18 ms per dispatch — infer/segment.py:56-58)
_JITTED_STACKS: dict = {}


def _stack_fn(mesh: Mesh, axis: str, halos: tuple):
    key = (id(mesh), axis, halos)
    fn = _JITTED_STACKS.get(key)
    if fn is not None:
        return fn

    def local(xl, *ks):
        for i, k in enumerate(ks):
            if halos[i]:
                prev_p, next_p = _exchange_depth_halos(xl, axis, halos[i])
                xl = jnp.concatenate([prev_p, xl, next_p], axis=1)
            # depth VALID over the haloed band == SAME on the global
            # volume; H/W stay SAME-padded locally (they are not sharded)
            hw_pad = [(k.shape[1] // 2,) * 2, (k.shape[2] // 2,) * 2]
            xl = lax.conv_general_dilated(
                xl, k, (1, 1, 1), [(0, 0)] + hw_pad,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            if i + 1 < len(ks):
                xl = jnp.maximum(xl, 0)          # ReLU between layers
        return xl

    fn = jax.jit(shard_map(local, mesh=mesh,
                           in_specs=(P(None, axis),) + (P(),) * len(halos),
                           out_specs=P(None, axis)))
    _JITTED_STACKS[key] = fn
    return fn


def _validate(x, kernels, mesh, axis):
    halos = []
    for k in kernels:
        kd, kh, kw = k.shape[0], k.shape[1], k.shape[2]
        if kd % 2 != 1:
            raise ValueError("kernel depth must be odd for SAME halo "
                             "sharding")
        if kh % 2 != 1 or kw % 2 != 1:
            raise ValueError("kernel H/W must be odd (symmetric local "
                             "padding == SAME); got "
                             f"{(kd, kh, kw)}")
        halos.append((kd - 1) // 2)
    nsh = mesh.shape[axis]
    if x.shape[1] % nsh:
        raise ValueError(f"depth {x.shape[1]} not divisible by {nsh} shards")
    if any(h and x.shape[1] // nsh < h for h in halos):
        raise ValueError("local depth band smaller than a layer's halo")
    return tuple(halos)


def conv3d_depth_sharded(x: jnp.ndarray, kernel: jnp.ndarray, mesh: Mesh,
                         axis: str = "data") -> jnp.ndarray:
    """SAME NDHWC conv3d with the volume sharded along depth over ``axis``.

    ``x``: (N, D, H, W, Cin) with D divisible by the mesh axis size;
    ``kernel``: (kd, kh, kw, Cin, Cout), all spatial dims odd (the depth
    halo is (kd-1)/2 planes per side). Equals the unsharded
    ``lax.conv_general_dilated(..., "SAME")`` exactly; each shard computes
    only its depth band and the halos move point-to-point over ICI.
    """
    return conv3d_stack_depth_sharded(x, [kernel], mesh, axis)


def conv3d_stack_depth_sharded(x: jnp.ndarray, kernels, mesh: Mesh,
                               axis: str = "data") -> jnp.ndarray:
    """Run a stack of SAME conv3d (+ReLU between) layers depth-sharded.

    One jitted shard_map region (cached per (mesh, axis, halos)): halos
    are exchanged per layer (each conv consumes one fresh halo ring) while
    the band itself never leaves its chip — the communication per layer is
    2 planes/shard however deep the stack is. Demonstrates the production
    pattern for whole-volume 3-D feature extraction beyond single-chip
    HBM."""
    halos = _validate(x, kernels, mesh, axis)
    fn = _stack_fn(mesh, axis, halos)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, axis)))
    return fn(xs, *kernels)


# ---------------------------------------------------------------------------
# Whole-model depth sharding (GSPMD) — the FULL 3-D U-Net, not just SAME
# conv stacks
# ---------------------------------------------------------------------------

_JITTED_MODELS: dict = {}


def make_depth_mesh(n: int, axis: str = "depth") -> Mesh:
    """1-D mesh over the first n devices for depth sharding."""
    import numpy as np
    devs = jax.devices()[:n]
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(jax.devices())}")
    return Mesh(np.asarray(devs), (axis,))


def unet3d_depth_sharded_apply(model, variables, mesh: Mesh,
                               axis: str = "depth"):
    """Whole-volume forward of the REAL 3-D U-Net with the volume sharded
    along depth (axis 1 of NDHWC) over the mesh.

    Unlike the conv-stack demo above (manual ppermute halos, SAME stride-1
    only), this partitions the complete ``models.unet3d.ResidualUNet3D``
    program — stride-2 downsampling convs, InstanceNorm's global spatial
    reductions, the phase-lowered transpose-conv upsampling, skip concats —
    by jitting the unmodified model with a depth-sharded input/output spec
    and letting XLA's SPMD partitioner insert the communication. On the
    compiled module this yields halo ``collective-permute`` ops for the
    strided/odd-kernel convs and ``all-reduce`` for the norm statistics,
    and (asserted in tests/test_spatial.py) NO full-volume all-gather:
    each device holds only its depth band of every activation, so
    whole-volume 3-D inference scales past one chip's HBM — the capability
    the reference dodges with 160x160x64 ROI crops
    (src/train/train_unet3d.py:39-54).

    Returns a callable ``f(x: (N, D, H, W, C)) -> logits`` (same layout);
    the jitted program is cached per (model, mesh, axis).

    Depth need NOT divide the mesh size: the sharding is applied as an
    internal ``with_sharding_constraint`` (GSPMD pads the uneven band
    internally), not as an ``in_shardings`` contract (which requires
    divisibility). When depth DOES divide, ``run`` device_puts the input
    pre-sharded so the host->device transfer is already banded and the
    constraint is a no-op.
    """
    key = (id(model), id(mesh), axis)
    fn = _JITTED_MODELS.get(key)
    xsh = NamedSharding(mesh, P(None, axis))
    rep = NamedSharding(mesh, P())
    if fn is None:
        def fwd(v, x):
            x = jax.lax.with_sharding_constraint(x, xsh)
            y = model.apply(v, x, train=False)
            # on uneven bands GSPMD may legalize this to replicated; the
            # interior still runs fully depth-sharded either way
            return jax.lax.with_sharding_constraint(y, xsh)

        fn = jax.jit(fwd, in_shardings=(rep, None))
        _JITTED_MODELS[key] = fn

    v = jax.device_put(variables, rep)

    def run(x):
        xs = jnp.asarray(x)
        if xs.shape[1] % mesh.devices.size == 0:
            xs = jax.device_put(xs, xsh)
        return fn(v, xs)

    run.jitted = fn          # exposed for compiled-HLO inspection in tests
    run.variables = v
    return run
