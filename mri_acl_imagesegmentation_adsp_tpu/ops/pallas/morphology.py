"""Fused binary opening+closing Pallas kernel.

The body-mask pipeline (ops/maskops.py, reference
mri_preprocess.py:210-212) applies four 5x5 disk-SE stencil passes
(erode -> dilate -> dilate -> erode). The jnp implementation lowers to four
separate convolutions with an HBM round-trip between each; this kernel runs
all four passes in VMEM with a single HBM read and write per slice.

Design notes (see pallas guide):
  * whole slice resident in VMEM (<=640x640 f32 = 1.6 MB << 16 MB), so a
    1-program grid with scratch ping-pong buffers suffices — no halo
    exchange machinery;
  * the disk(2) SE is decomposed into its 13 taps; each pass is a tap-sum
    via ``pltpu.roll`` shifts (VPU) + compare, with border semantics
    matching skimage (erosion pads True, dilation pads False) enforced by
    masking rolled-in wrap-around rows/cols;
  * float32 0/1 masks (TPU-friendly lanes; bools would tile at (32,128)).

Falls back to interpret mode off-TPU so CPU tests exercise the same code.

Status: measured on the target v5e chip this kernel is substantially SLOWER
than the XLA conv formulation in ops/maskops.py (the 13-tap disk SE maps
onto one MXU convolution, which beats 48 VPU roll+mask passes; 2025-08
measurement: ~2.0 s vs ~78 ms steady-state on 320x320 through this
environment's remote-compile backend). The conv path therefore remains the
default for body_mask; this kernel is kept as the fused-VMEM alternative
and is correctness-pinned against the conv path in tests.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# disk(2) taps: (dy, dx) offsets with dy^2+dx^2 <= 4
_TAPS = tuple((dy, dx) for dy in range(-2, 3) for dx in range(-2, 3)
              if dy * dy + dx * dx <= 4)


def _shift_with_fill(x, dy, dx, fill, h, w):
    """Shift x by (dy, dx) filling vacated cells with ``fill`` (no wrap).

    pltpu.roll only takes non-negative shifts; negative offsets roll by
    n+shift (circular equivalence) and the fill mask keys on the sign.
    """
    y = x
    if dy:
        y = pltpu.roll(y, dy % h, 0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        mask = rows < dy if dy > 0 else rows >= h + dy
        y = jnp.where(mask, fill, y)
    if dx:
        y = pltpu.roll(y, dx % w, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        mask = cols < dx if dx > 0 else cols >= w + dx
        y = jnp.where(mask, fill, y)
    return y


def _erode(x, h, w):
    """All taps must be 1; out-of-image counts as 1 (skimage border)."""
    acc = x
    for dy, dx in _TAPS:
        if dy == 0 and dx == 0:
            continue
        acc = acc * _shift_with_fill(x, dy, dx, 1.0, h, w)
    return acc


def _dilate(x, h, w):
    """Any tap is 1; out-of-image counts as 0."""
    acc = x
    for dy, dx in _TAPS:
        if dy == 0 and dx == 0:
            continue
        acc = jnp.maximum(acc, _shift_with_fill(x, dy, dx, 0.0, h, w))
    return acc


def _open_close_kernel(x_ref, o_ref):
    h, w = x_ref.shape
    m = x_ref[:]
    m = _dilate(_erode(m, h, w), h, w)   # opening
    m = _erode(_dilate(m, h, w), h, w)   # closing
    o_ref[:] = m


@partial(jax.jit, static_argnames=("interpret",))
def _fused_open_close(mask_f32: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    return pl.pallas_call(
        _open_close_kernel,
        out_shape=jax.ShapeDtypeStruct(mask_f32.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(mask_f32)


def fused_open_close(mask: jnp.ndarray) -> jnp.ndarray:
    """disk(2) binary opening then closing of a (H, W) mask, one kernel.

    Matches binary_closing(binary_opening(mask, disk(2)), disk(2)) from
    ops/maskops.py bit-for-bit (tests pin this).
    """
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = _fused_open_close(mask.astype(jnp.float32), interpret)
    return out > 0.5
