"""HBM-resident 3-D volume store with device-side ROI patch sampling.

The host path (train/trainer3d.py:KneeNPZ3D, reference
src/train/train_unet3d.py:15-71 semantics) extracts patches in Python.
This store uploads every z-scored volume once (padded to a common slice
count) together with a per-volume table of positive-voxel coordinates, and
then samples positive-biased ROI patches INSIDE jit: volume choice,
positive/negative coin, center draw and the (D, Y, X) ``dynamic_slice``
all run on device, so the train step needs zero host->device traffic per
batch. Opt-in via UNet3DArgs.device_sampling (the host sampler remains the
reference-semantics default).

Semantics notes vs the host sampler:
  * identical positive-bias coin (ratio/(1+ratio)) and center clipping;
  * volumes shallower than the ROI depth are zero-padded instead of
    shrinking the patch (static shapes under jit);
  * the positive-center draw comes from a pre-sampled coordinate table
    (default 4096 entries/volume) instead of the full voxel list.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .hbm_loader import read_list


class DeviceVolumeStore:
    """Padded (V, S_max, H, W) device arrays + positive-coordinate table."""

    def __init__(self, list_txt: str, max_pos: int = 4096, seed: int = 0):
        files = read_list(list_txt)
        rng = np.random.default_rng(seed)
        vols, msks, sizes = [], [], []
        for p in files:
            with np.load(p) as z:
                x = z["img"].astype(np.float32)[:, 0]      # (S, H, W)
                y = z["msk"].astype(np.int32)
            x = (x - x.mean()) / (x.std() + 1e-6)          # per-volume z-score
            vols.append(x)
            msks.append(y)
            sizes.append(x.shape)
        s_max = max(v.shape[0] for v in vols)
        h, w = vols[0].shape[1:]
        if any(v.shape[1:] != (h, w) for v in vols):
            raise ValueError("volumes must share (H, W) for the device store")

        imgs = np.zeros((len(vols), s_max, h, w), np.float32)
        masks = np.zeros((len(vols), s_max, h, w), np.int32)
        pos_tab = np.zeros((len(vols), max_pos, 3), np.int32)
        pos_cnt = np.zeros((len(vols),), np.int32)
        for i, (v, m) in enumerate(zip(vols, msks)):
            imgs[i, : v.shape[0]] = v
            masks[i, : m.shape[0]] = m
            zz, yy, xx = np.nonzero(m > 0)
            if len(zz):
                take = rng.integers(0, len(zz), size=max_pos)
                pos_tab[i] = np.stack([zz[take], yy[take], xx[take]], axis=1)
                pos_cnt[i] = min(len(zz), max_pos)

        self.files = files
        self.images = jax.device_put(jnp.asarray(imgs))
        self.masks = jax.device_put(jnp.asarray(masks))
        self.sizes = jax.device_put(jnp.asarray(np.asarray(sizes), jnp.int32))
        self.pos_tab = jax.device_put(jnp.asarray(pos_tab))
        self.pos_cnt = jax.device_put(jnp.asarray(pos_cnt))
        self.num_volumes = len(files)

    def sample_batch(self, key: jax.Array, batch: int,
                     roi: Sequence[int], pos_neg_ratio: float
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B, D, Y, X, 1) float patches + (B, D, Y, X) int masks, sampled
        entirely on device."""
        return _sample_patches(
            self.images, self.masks, self.sizes, self.pos_tab, self.pos_cnt,
            key, int(batch), tuple(int(r) for r in roi),
            float(pos_neg_ratio))


@partial(jax.jit, static_argnames=("batch", "roi"))
def _sample_patches(images, masks, sizes, pos_tab, pos_cnt, key,
                    batch: int, roi: Tuple[int, int, int], ratio: float):
    yy, xx, dd = roi      # reference roi order: (Y, X, D) (train_unet3d.py)
    v_count = images.shape[0]

    def one(k):
        kv, kp, kj, kz, ky, kx = jax.random.split(k, 6)
        v = jax.random.randint(kv, (), 0, v_count)
        s, hgt, wid = sizes[v, 0], sizes[v, 1], sizes[v, 2]
        want_pos = (jax.random.uniform(kp) < ratio / (1.0 + ratio)) \
            & (pos_cnt[v] > 0)
        j = jax.random.randint(kj, (), 0, jnp.maximum(pos_cnt[v], 1))
        c_pos = pos_tab[v, j]                           # (z, y, x)
        c_neg = jnp.stack([jax.random.randint(kz, (), 0, s),
                           jax.random.randint(ky, (), 0, hgt),
                           jax.random.randint(kx, (), 0, wid)])
        c = jnp.where(want_pos, c_pos, c_neg)
        z0 = jnp.clip(c[0] - dd // 2, 0, jnp.maximum(0, s - dd))
        y0 = jnp.clip(c[1] - yy // 2, 0, jnp.maximum(0, hgt - yy))
        x0 = jnp.clip(c[2] - xx // 2, 0, jnp.maximum(0, wid - xx))
        px = lax.dynamic_slice(images, (v, z0, y0, x0), (1, dd, yy, xx))[0]
        py = lax.dynamic_slice(masks, (v, z0, y0, x0), (1, dd, yy, xx))[0]
        return px, py

    keys = jax.random.split(key, batch)
    px, py = jax.vmap(one)(keys)
    return px[..., None], py
