"""Phase-space (space-to-depth) lowering of the U-Net decoder convs.

Why: the decoder of the smp-style U-Net (models/unet2d.py, displacing
reference src/models/unet_factory.py) spends ~70% of inference device time
at ~6% MFU — its convs have 16-32 channels at 160-320 px, so 7/8 of the
MXU's 128 output lanes idle while the VPU shuffles a 4x-materialized
nearest-upsampled tensor. Measured on the target v5e (scripts/
micro_decoder.py): nearest-up2x + conv3x3 32->16 @320^2 takes 6.33 ms per
32-batch, while the mathematically identical phase formulation below takes
0.59 ms (10.8x); the in-block 3x3 convs gain 2.1-3.4x.

The identity: for even output grids, a 3x3 SAME conv at (2L x 2L) is a
2x2-support VALID conv at (L x L) over the 4-phase space-to-depth
representation. Writing the high-res row index as r = 2y + a (a in {0,1} =
row phase), a conv tap dy in {-1,0,1} reads low-res row ly = (r+dy)//2 and
input phase pa = (r+dy) mod 2; the window {ly} spans exactly two low-res
rows. Three lowering flavours are built from the SAME (3,3,Ci,Co) kernel
parameter (so parameter trees and checkpoints stay interchangeable with the
naive path):

  * up-conv   — conv3x3(nearest_up2(x)): all 4 input phases equal x, so the
                phase kernel collapses to (2,2,Ci,4Co) with row/col tap sums
                (2.25x FEWER FLOPs than up+conv, and the 4x-size upsampled
                tensor is never materialized);
  * dense     — conv3x3(y) for y already in phase space: (2,2,4Ci,4Co) with
                the 9 taps scattered into 9 of the 16 (window, phase) slots
                (1.78x the FLOPs, at MXU-shaped operand sizes);
  * the block output stays in phase space until one depth_to_space at the
    block boundary.

Everything here is linear in the kernel parameter, so gradients flow to the
original (3,3) kernels and the naive/fused paths are exactly equal in f32
(pinned in tests/test_models.py).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

# Row-phase tap-sum factors for the up-conv: R[a][u, t] says window row u of
# output phase a accumulates kernel row t (t = dy+1). Derived from
# ly = (2y + a + dy) // 2 with window start y - 1 + a.
_R_UP = np.asarray(
    [[[1.0, 0.0, 0.0],   # a=0: row y-1 <- dy=-1 ; row y <- dy=0 and dy=+1
      [0.0, 1.0, 1.0]],
     [[1.0, 1.0, 0.0],   # a=1: row y <- dy=-1 and dy=0 ; row y+1 <- dy=+1
      [0.0, 0.0, 1.0]]], np.float32)

# Dense scatter M[a, u, p, t]: output phase a takes kernel row t from window
# slot u, input phase p. (9 of the 16 (u,p) slots per (a,b) pair are live.)
_M_DENSE = np.zeros((2, 2, 2, 3), np.float32)
_M_DENSE[0, 0, 1, 0] = 1.0   # a=0, dy=-1 -> row y-1, phase 1
_M_DENSE[0, 1, 0, 1] = 1.0   # a=0, dy= 0 -> row y,   phase 0
_M_DENSE[0, 1, 1, 2] = 1.0   # a=0, dy=+1 -> row y,   phase 1
_M_DENSE[1, 0, 0, 0] = 1.0   # a=1, dy=-1 -> row y,   phase 0
_M_DENSE[1, 0, 1, 1] = 1.0   # a=1, dy= 0 -> row y,   phase 1
_M_DENSE[1, 1, 0, 2] = 1.0   # a=1, dy=+1 -> row y+1, phase 0


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, 2L, 2L', C) -> (B, L, L', 4C), phase-major (channel (2a+b)C+c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """(B, L, L', 4C) phase-major -> (B, 2L, 2L', C)."""
    b, h, w, f = x.shape
    c = f // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


def upconv_phase_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Ci,Co) -> (2,2,Ci,4Co) computing conv3x3(nearest_up2(x))."""
    ci, co = k.shape[2], k.shape[3]
    r = jnp.asarray(_R_UP, k.dtype)   # 0/1 factors: exact in any dtype
    w = jnp.einsum("aut,bvs,tsio->uviabo", r, r, k)
    return w.reshape(2, 2, ci, 4 * co)


# 3x3-SAME embedding of the up-conv: window slot u in {0,1,2} <-> low-res
# row offset delta in {-1,0,+1}; phase a=0 reads rows {y-1, y}, a=1 reads
# {y, y+1}, so the 2-row support embeds into the shared SAME window and all
# four output phases land at the SAME output position — no shifted-slice
# epilogue. (Measured on the v5e: the 2x2-VALID variant's pad+4-slice+concat
# epilogue costs 7x the conv itself; this embedding is epilogue-free at
# 9/4 of the 2x2 variant's FLOPs, which still equals the plain conv3x3
# FLOP count and avoids materializing the 4x upsampled tensor.)
_R_UP3 = np.asarray(
    [[[1.0, 0.0, 0.0],   # a=0: delta=-1 <- K[0];  delta=0 <- K[1]+K[2]
      [0.0, 1.0, 1.0],
      [0.0, 0.0, 0.0]],
     [[0.0, 0.0, 0.0],   # a=1: delta=0 <- K[0]+K[1];  delta=+1 <- K[2]
      [1.0, 1.0, 0.0],
      [0.0, 0.0, 1.0]]], np.float32)


def upconv_embedded_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Ci,Co) -> (3,3,Ci,4Co): conv3x3(nearest_up2(x)) as ONE 3x3 SAME
    conv at low resolution followed by depth_to_space. Phase-major output
    channel layout (2a+b)*Co + co, matching depth_to_space. The embedding
    runs in k.dtype (its factors are 0/1, and callers may cast the kernel
    to the compute dtype FIRST to halve per-step assembly traffic)."""
    ci, co = k.shape[2], k.shape[3]
    r = jnp.asarray(_R_UP3, k.dtype)
    w = jnp.einsum("aut,bvs,tsio->uviabo", r, r, k)
    return w.reshape(3, 3, ci, 4 * co)


# 3x3-SAME embedding of the DENSE phase conv (input already phase-major).
# Output phase row a takes tap dy from low-res row y + delta, input phase p:
#   r = 2y + a, input row r + dy -> p = (a+dy) mod 2, delta = (a+dy) // 2
#   a=0: dy=-1 -> (delta=-1, p=1); dy=0 -> (0, 0); dy=+1 -> (0, 1)
#   a=1: dy=-1 -> (delta=0,  p=0); dy=0 -> (0, 1); dy=+1 -> (+1, 0)
# With delta as the 3x3 SAME window slot (slot = delta+1), every output
# phase lands at the SAME output position — epilogue-free, like
# upconv_embedded_kernel. SAME zero padding is exact: high-res pad rows map
# to all-zero out-of-range low-res phase rows. 9/4 the FLOPs of the
# 2x2-VALID dense variant (= 4x the plain conv3x3), paid for MXU-shaped
# 4C-channel operands — only worth it where the high-res conv is
# pathologically shaped (e.g. the 1-channel segmentation head).
_M3_DENSE = np.zeros((2, 3, 2, 3), np.float32)
_M3_DENSE[0, 0, 1, 0] = 1.0   # a=0, dy=-1 -> slot 0 (delta -1), phase 1
_M3_DENSE[0, 1, 0, 1] = 1.0   # a=0, dy= 0 -> slot 1, phase 0
_M3_DENSE[0, 1, 1, 2] = 1.0   # a=0, dy=+1 -> slot 1, phase 1
_M3_DENSE[1, 1, 0, 0] = 1.0   # a=1, dy=-1 -> slot 1, phase 0
_M3_DENSE[1, 1, 1, 1] = 1.0   # a=1, dy= 0 -> slot 1, phase 1
_M3_DENSE[1, 2, 0, 2] = 1.0   # a=1, dy=+1 -> slot 2 (delta +1), phase 0


def dense_embedded_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Ci,Co) -> (3,3,4Ci,4Co): conv3x3 on a phase-major tensor as ONE
    3x3 SAME conv (no shifted-slice epilogue); output stays phase-major.
    Runs in k.dtype (one-hot scatter — exact in any dtype)."""
    ci, co = k.shape[2], k.shape[3]
    m = jnp.asarray(_M3_DENSE, k.dtype)
    w = jnp.einsum("aupt,bvqs,tsio->uvpqiabo", m, m, k)
    return w.reshape(3, 3, 4 * ci, 4 * co)


# Strided (high-res -> phase-major) embedding: out[y,x,(2a+b)Co+co] =
# conv3x3(s)[2y+a, 2x+b, co]. A stride-2 conv with a 4x4 kernel and SAME-
# style padding (1,1) reads high-res rows {2y-1 .. 2y+2} = slot u = 0..3;
# output phase a takes kernel row t (= dy+1) from slot u = a + t.
_S4 = np.zeros((2, 4, 3), np.float32)
for _a in (0, 1):
    for _t in range(3):
        _S4[_a, _a + _t, _t] = 1.0


def strided_phase_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Ci,Co) -> (4,4,Ci,4Co): conv3x3 on a HIGH-RES tensor emitting
    phase-major output directly (one stride-2 conv, padding (1,1)) — the
    space-to-depth of the conv's output without materializing it.
    Runs in k.dtype (one-hot scatter — exact in any dtype)."""
    ci, co = k.shape[2], k.shape[3]
    s4 = jnp.asarray(_S4, k.dtype)
    w = jnp.einsum("aut,bvs,tsio->uviabo", s4, s4, k)
    return w.reshape(4, 4, ci, 4 * co)


def apply_strided_phase(x: jnp.ndarray, w4: jnp.ndarray,
                        dtype=None) -> jnp.ndarray:
    """Run a (4,4,Ci,4Co) strided phase kernel on high-res x (B,2L,2L',Ci)
    -> phase-major (B,L,L',4Co)."""
    if dtype is not None:
        x, w4 = x.astype(dtype), w4.astype(dtype)
    return lax.conv_general_dilated(
        x, w4, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def dense_phase_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Ci,Co) -> (2,2,4Ci,4Co) computing conv3x3 on phase-space input."""
    ci, co = k.shape[2], k.shape[3]
    m = jnp.asarray(_M_DENSE, k.dtype)
    w = jnp.einsum("aupt,bvqs,tsio->uvpqiabo", m, m, k)
    return w.reshape(2, 2, 4 * ci, 4 * co)


# ---------------------------------------------------------------------------
# Transpose-conv relowering (2-D and 3-D): a kernel-2 stride-2 transpose conv
# touches every output pixel with EXACTLY ONE tap, so it is identically a
# 1x1(x1) conv emitting the 2^nd phase groups followed by depth_to_space —
# zero FLOP overhead, and the MXU sees a plain dense contraction instead of
# XLA's input-dilated scatter lowering.
# ---------------------------------------------------------------------------

def tconv_phase_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(2,2,Ci,Co) ConvTranspose kernel -> (1,1,Ci,4Co) phase-major.

    flax/lax conv_transpose applies the kernel FLIPPED (output phase (a,b)
    reads K[1-a, 1-b]), so the taps are reversed before phase-flattening.
    """
    ci, co = k.shape[2], k.shape[3]
    k = k[::-1, ::-1]
    return jnp.transpose(k, (2, 0, 1, 3)).reshape(1, 1, ci, 4 * co)


def space_to_depth3(x: jnp.ndarray) -> jnp.ndarray:
    """(B,2D,2H,2W,C) -> (B,D,H,W,8C), phase-major (4a+2b+c)."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, d // 2, h // 2, w // 2, 8 * c)


def depth_to_space3(x: jnp.ndarray) -> jnp.ndarray:
    """(B,D,H,W,8C) phase-major -> (B,2D,2H,2W,C)."""
    b, d, h, w, f = x.shape
    c = f // 8
    x = x.reshape(b, d, h, w, 2, 2, 2, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, 2 * d, 2 * h, 2 * w, c)


def tconv_phase_kernel3(k: jnp.ndarray) -> jnp.ndarray:
    """(2,2,2,Ci,Co) ConvTranspose kernel -> (1,1,1,Ci,8Co) phase-major
    (kernel flipped per conv_transpose semantics, see tconv_phase_kernel)."""
    ci, co = k.shape[3], k.shape[4]
    k = k[::-1, ::-1, ::-1]
    return jnp.transpose(k, (3, 0, 1, 2, 4)).reshape(1, 1, 1, ci, 8 * co)


def apply_phase_conv(x: jnp.ndarray, w: jnp.ndarray,
                     dtype=jnp.float32) -> jnp.ndarray:
    """Run a lowered (2,2,Cin,4Co) kernel; returns phase-major (B,L,L',4Co).

    One zero-padded VALID conv covers all window starts; output phase (a,b)
    then reads the (a,b)-shifted window slice of its own channel group
    (window start for output y is y-1+a, see module docstring).
    """
    b, hl, wl, _ = x.shape
    co = w.shape[-1] // 4
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = lax.conv_general_dilated(
        xp.astype(dtype), w.astype(dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))   # (B, L+1, L'+1, 4Co)
    parts = []
    for a in (0, 1):
        for bb in (0, 1):
            p = 2 * a + bb
            parts.append(y[:, a:a + hl, bb:bb + wl,
                           p * co:(p + 1) * co])
    return jnp.concatenate(parts, axis=-1)
