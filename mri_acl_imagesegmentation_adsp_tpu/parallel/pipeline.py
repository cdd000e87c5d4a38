"""GPipe-style pipeline parallelism over identical stages via ppermute.

VarNet's unrolled cascade chain (recon/varnet.py, vendored
DL_reconstruction/models/varnet.py:265-306) is a textbook pipeline: N
structurally identical stages, each too cheap to shard internally but
long enough in aggregate that a deep unroll (10-12 cascades at protocol
size) dominates the step. The TPU-native formulation:

  - stage parameters are STACKED on a leading dim and sharded over a
    "pipe" mesh axis (each device holds ``num_cascades / axis_size``
    consecutive cascades);
  - the batch is split into M microbatches; activations circulate
    device-to-device with ``lax.ppermute`` (nearest-neighbor ICI hops)
    on the classic GPipe schedule — step t runs microbatch ``t - s`` on
    stage-group ``s``, so the pipe fills in ``S-1`` steps and drains in
    ``S-1``, with bubble fraction ``(S-1)/(M+S-1)``;
  - per-microbatch constants (reference k-space, sensitivity maps) do
    NOT circulate: every device indexes them directly at ``t - s``,
    saving 2/3 of the permute bandwidth;
  - the whole schedule is ONE ``lax.scan`` inside ONE ``shard_map``
    region, so XLA overlaps each step's compute with the permute DMA and
    reverse-mode AD derives the backward pipeline (reverse ppermute)
    automatically — no hand-written 1F1B machinery.

Numerics: every microbatch runs exactly the sequential program (no
re-association), so outputs are pinned at ulp level (compiler fusion is
the only difference) against the unrolled single-device model in
tests/test_varnet_shard.py.

Idle lanes compute on the previous valid activation (finite garbage,
never NaN) and their results are discarded by the schedule masks; their
parameter cotangents are exactly zero.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

# no jax.experimental fallback here: gpipe needs lax.pcast (the shard_map
# vma type system), which only exists on jax versions that export
# jax.shard_map directly
from jax import shard_map


def gpipe(mesh: Mesh, axis: str, stage_fn: Callable[[Any, Any, Any], Any],
          stage_params: Any, micro_state: Any, micro_consts: Any) -> Any:
    """Run ``S`` stacked stages over ``M`` microbatches, pipelined.

    stage_fn(params_of_one_stage, state, consts) -> state
    stage_params: pytree, every leaf stacked to (S_total, ...);
        S_total must be a multiple of the "pipe" axis size (each device
        scans its local group of ``S_total / size`` stages in order).
    micro_state:  pytree, leaves (M, mb, ...) — the circulating
        activations, already split into M microbatches.
    micro_consts: pytree, leaves (M, mb, ...) — per-microbatch
        constants, indexed locally (never permuted).

    Returns the final state pytree, leaves (M, mb, ...), replicated.
    """
    size = mesh.shape[axis]
    leaves = jax.tree.leaves(stage_params)
    if not leaves:
        raise ValueError("stage_params has no leaves")
    s_total = leaves[0].shape[0]
    if s_total % size:
        raise ValueError(f"{s_total} stages do not tile a {size}-way "
                         f"'{axis}' pipe axis")
    m_leaves = jax.tree.leaves(micro_state)
    n_micro = m_leaves[0].shape[0]

    def run(params_local, state_mb, consts_mb):
        stage = lax.axis_index(axis)

        def local_group(state, consts):
            def one(st, p):
                return stage_fn(p, st, consts), None
            out, _ = lax.scan(one, state, params_local)
            return out

        def step(carry, t):
            buf, acc = carry
            idx = jnp.clip(t - stage, 0, n_micro - 1)
            feed = jax.tree.map(lambda a: a[idx], state_mb)
            consts = jax.tree.map(lambda a: a[idx], consts_mb)
            x_in = jax.tree.map(
                lambda f, b: jnp.where(stage == 0, f, b), feed, buf)
            y = local_group(x_in, consts)
            # last stage emits microbatch t-(S-1) while it is in-window
            w = t - (size - 1)
            valid = (stage == size - 1) & (w >= 0) & (w < n_micro)
            widx = jnp.clip(w, 0, n_micro - 1)
            acc = jax.tree.map(
                lambda o, yy: o.at[widx].set(jnp.where(valid, yy, o[widx])),
                acc, y)
            nxt = jax.tree.map(
                lambda a: lax.ppermute(
                    a, axis, [(i, i + 1) for i in range(size - 1)]), y)
            return (nxt, acc), None

        # initial carry must already be marked device-varying over the
        # pipe axis (the loop output is) — shard_map's vma type system
        def vary(t):
            return jax.tree.map(
                lambda a: lax.pcast(a, (axis,), to="varying"), t)

        buf0 = vary(jax.tree.map(lambda a: a[0], state_mb))  # finite seed
        acc0 = vary(jax.tree.map(jnp.zeros_like, state_mb))
        (_, acc), _ = lax.scan(step, (buf0, acc0),
                               jnp.arange(n_micro + size - 1))
        # only the last stage wrote non-zeros; the sum replicates them
        return jax.tree.map(lambda a: lax.psum(a, axis), acc)

    fn = shard_map(run, mesh=mesh,
                   in_specs=(P(axis), P(), P()), out_specs=P())
    return fn(stage_params, micro_state, micro_consts)


# ---------------------------------------------------------------------------
# VarNet: cascades as pipeline stages
# ---------------------------------------------------------------------------

def stack_cascade_params(params: Any, num_cascades: int) -> Any:
    """Stack the per-cascade VarNetBlock param subtrees on a leading dim."""
    blocks = [params[f"VarNetBlock_{i}"] for i in range(num_cascades)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def varnet_apply_pipelined(model, variables: Any, kspace: jnp.ndarray,
                           espirit: jnp.ndarray, mesh: Mesh,
                           axis: str = "pipe",
                           n_microbatches: Optional[int] = None
                           ) -> jnp.ndarray:
    """``model.apply(variables, kspace, espirit)`` with the cascade chain
    pipeline-parallel over ``axis``.

    The sensitivity model and the final coil combine run replicated (they
    are a fixed fraction of the step); the ``num_cascades`` VarNetBlocks
    run as GPipe stages (see module docstring). Parameters enter in the
    model's own tree structure, so gradients of a loss through this
    function land in the same structure as the unsharded model's.

    Requirements: ``num_cascades`` divides by the pipe-axis size and the
    batch by ``n_microbatches`` (default: the pipe-axis size).
    """
    from ..recon.varnet import (SensitivityModel, VarNetBlock,
                                sens_reduce_parts, _dft_precision)

    params = variables["params"]
    b, coils, aves = kspace.shape[0], kspace.shape[1], kspace.shape[2]
    m = n_microbatches or mesh.shape[axis]
    if b % m:
        raise ValueError(f"batch {b} does not split into {m} microbatches")

    e32 = espirit.astype(jnp.float32)
    sens = SensitivityModel(model.sens_chans, model.sens_pools,
                            dtype=model.dtype,
                            phase_max_chans=model.phase_max_chans)
    sr, si = sens.apply({"params": params["SensitivityModel_0"]},
                        e32[..., 0], e32[..., 1], False)

    dt = model.dtype
    kr = kspace[..., 0].astype(dt)
    ki = kspace[..., 1].astype(dt)
    sr, si = sr.astype(dt), si.astype(dt)

    blk = VarNetBlock(model.chans, model.pools, reg_in_chans=2 * aves,
                      dtype=model.dtype,
                      phase_max_chans=model.phase_max_chans)

    def stage_fn(p, state, consts):
        skr, ski = state
        k0r, k0i, csr, csi = consts
        return blk.apply({"params": p}, skr, ski, k0r, k0i, csr, csi, False)

    def split(x):
        return x.reshape(m, b // m, *x.shape[1:])

    stacked = stack_cascade_params(params, model.num_cascades)
    out_r, out_i = gpipe(mesh, axis, stage_fn, stacked,
                         (split(kr), split(ki)),
                         (split(kr), split(ki), split(sr), split(si)))
    fr = out_r.reshape(b, *out_r.shape[2:])
    fi = out_i.reshape(b, *out_i.shape[2:])

    prec = _dft_precision(model.dtype)
    rr, ri = sens_reduce_parts(fr, fi, sr, si, prec)
    rr, ri = rr.astype(jnp.float32), ri.astype(jnp.float32)
    return jnp.sqrt(rr * rr + ri * ri)
