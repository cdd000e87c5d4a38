"""HBM-resident slice store — the TPU-native replacement for DataLoader.

The reference's input pipeline (src/dataio/datasets.py:44-133 +
torch DataLoader, 4 worker processes) re-opens the whole volume.npz for
EVERY slice fetch (its documented hot spot, SURVEY.md §3.2). Here the entire
preprocessed dataset is packed once into flat arrays and moved to device
HBM; batches are formed INSIDE the jitted train step by gathering rows with
a permutation index — zero host<->device traffic per step, zero worker
processes, and the 2.5-D neighbor stacking (dataio/datasets.py:89-95
semantics: edge-clamped adjacent slices as channels) becomes a static
gather table.

Memory: 973 volumes x ~14 slices x 320^2 f32 ~= 5.6 GB — fits one v5e chip;
``dtype=bfloat16`` halves it. For multi-chip data parallelism the arrays can
be replicated or sharded over the mesh's data axis (volume-affine order is
preserved, so contiguous shards keep volumes together — the VolumeSampler
equivalent, SURVEY.md §2.2).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def read_list(txt_path: str) -> List[str]:
    """Read a list file: one volume.npz path per line (datasets.py:20-22)."""
    with open(txt_path, "r", encoding="utf-8") as f:
        return [ln.strip() for ln in f if ln.strip()]


@dataclass
class SliceStore:
    """Flat, volume-ordered slice arrays + per-volume boundaries (host side)."""
    images: np.ndarray        # (N, H, W) float32   (z-scored)
    masks: np.ndarray         # (N, H, W) int32     (binary {0,1} or labels)
    vol_starts: np.ndarray    # (V,) int64 start row of each volume
    vol_sizes: np.ndarray     # (V,) int64 slices per volume
    files: List[str]

    @classmethod
    def from_list(cls, list_txt: str, workers: int = 0) -> "SliceStore":
        return cls.from_files(read_list(list_txt), workers=workers)

    @staticmethod
    def _load_one(p: str):
        """One volume: native C++ reader (GIL-released zlib inflate) with a
        transparent np.load fallback."""
        from ..native import load_volume_npz
        loaded = load_volume_npz(p)
        if loaded is not None:
            x, y = loaded
            return x.astype(np.float32, copy=False), y.astype(np.int32)
        with np.load(p) as z:
            return z["img"].astype(np.float32), z["msk"].astype(np.int32)

    @classmethod
    def from_files(cls, files: Sequence[str], workers: int = 0) -> "SliceStore":
        loaded = None
        if workers and len(files) > 1:
            # native readahead first: a C++ thread pool loads all archives
            # in parallel (no Python threads); per-volume failures fall
            # back to np.load below
            from ..native import load_volumes_npz
            bulk = load_volumes_npz(list(files), threads=workers)
            if bulk is not None:
                loaded = []
                for p, pair in zip(files, bulk):
                    if pair is None:
                        loaded.append(cls._load_one(p))
                    else:
                        x, y = pair
                        loaded.append((x.astype(np.float32, copy=False),
                                       y.astype(np.int32)))
        if loaded is None:
            if workers and len(files) > 1:
                from concurrent.futures import ThreadPoolExecutor
                with ThreadPoolExecutor(max_workers=workers) as ex:
                    loaded = list(ex.map(cls._load_one, files))
            else:
                loaded = [cls._load_one(p) for p in files]
        imgs, msks, starts, sizes = [], [], [], []
        n = 0
        for x, y in loaded:
            imgs.append(x[:, 0])                  # (S,1,H,W) -> (S,H,W)
            msks.append(y)
            starts.append(n)
            sizes.append(x.shape[0])
            n += x.shape[0]
        if not imgs:
            raise ValueError("Empty volume list")
        return cls(
            images=np.concatenate(imgs, axis=0),
            masks=np.concatenate(msks, axis=0),
            vol_starts=np.asarray(starts, np.int64),
            vol_sizes=np.asarray(sizes, np.int64),
            files=list(files),
        )

    def __len__(self) -> int:
        return self.images.shape[0]

    @property
    def num_volumes(self) -> int:
        return len(self.vol_sizes)

    def vol_ids(self) -> np.ndarray:
        """(N,) volume id per slice (volume-affine sharding key)."""
        return np.repeat(np.arange(self.num_volumes), self.vol_sizes)

    def neighbor_table(self, k: int) -> np.ndarray:
        """(N, k) int32 global indices of the 2.5-D neighbor stack.

        Semantics of dataio/datasets.py:89-95: k odd, offsets -k//2..k//2,
        clamped to the volume's own slice range.
        """
        assert k >= 1 and k % 2 == 1, "k must be odd (1,3,5,...)"
        half = k // 2
        n = len(self)
        starts = np.repeat(self.vol_starts, self.vol_sizes)
        ends = starts + np.repeat(self.vol_sizes, self.vol_sizes) - 1
        base = np.arange(n)
        cols = []
        for d in range(-half, half + 1):
            cols.append(np.clip(base + d, starts, ends))
        return np.stack(cols, axis=1).astype(np.int32)

    # ------------------------------------------------------------------

    def to_device(self, k: int = 1, image_dtype=jnp.float32,
                  device: Optional[jax.Device] = None,
                  mesh=None, shard: bool = False) -> "DeviceSliceStore":
        """Move the store (+ neighbor table for this k) into device HBM.

        With ``mesh`` and ``shard=True`` the slice arrays are sharded over
        the mesh's "data" axis (row-sharded HBM store: each chip holds
        1/N of the dataset; in-scan gathers ride ICI). The store is padded
        with repeats of the last slice to a multiple of the axis size —
        padding rows are inert because permutations only index
        [0, num_slices). Otherwise arrays are replicated/placed singly.
        """
        n = len(self)
        images = self.images
        masks = self.masks
        nbr = self.neighbor_table(k)
        if mesh is not None and shard:
            from jax.sharding import NamedSharding, PartitionSpec as P
            axes = tuple(mesh.axis_names)   # row-shard over ALL mesh axes
            parts = int(np.prod([mesh.shape[a] for a in axes]))
            pad = (-n) % parts
            if pad:
                images = np.concatenate([images, images[-1:].repeat(pad, 0)])
                masks = np.concatenate([masks, masks[-1:].repeat(pad, 0)])
                nbr = np.concatenate([nbr, nbr[-1:].repeat(pad, 0)])
            row = NamedSharding(mesh, P(axes))
            put = lambda x: jax.device_put(x, row)
        elif device:
            put = lambda x: jax.device_put(x, device)
        else:
            put = jax.device_put
        # masks live as uint8 on device: labels are tiny class ids, and at
        # corpus scale int32 masks cost as much HBM as the images (the
        # reference corpus is ~11k 320^2 slices -> 4.6 GB each as int32/f32
        # on a 16 GB chip). uint8 quarters the mask residency and the
        # per-step gather traffic; losses one-hot/float-cast downstream.
        mask_dtype = jnp.uint8 if np.max(masks, initial=0) < 256 else jnp.int32
        return DeviceSliceStore(
            images=put(jnp.asarray(images, dtype=image_dtype)),
            masks=put(jnp.asarray(masks, dtype=mask_dtype)),
            neighbors=put(jnp.asarray(nbr)),
            k=k,
            num_slices=n,
        )


@dataclass
class DeviceSliceStore:
    """Device-resident arrays; consumed inside jitted steps via gather.

    ``masks`` is uint8 when all labels fit (the common case — binary body
    masks or small class counts), int32 otherwise; consumers must not
    assume a specific integer dtype (losses one-hot/float-cast).
    """
    images: jnp.ndarray     # (N, H, W)
    masks: jnp.ndarray      # (N, H, W) uint8 (int32 if labels >= 256)
    neighbors: jnp.ndarray  # (N, k) int32
    k: int
    num_slices: int


def gather_batch(store_images: jnp.ndarray, store_masks: jnp.ndarray,
                 neighbors: jnp.ndarray, idx: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather a batch INSIDE jit: idx (B,) -> x (B, H, W, k) NHWC, y (B, H, W).

    The 2.5-D channel stack comes from the neighbor table; the center slice's
    mask is the target (datasets.py:97).
    """
    nbr = neighbors[idx]                       # (B, k)
    x = store_images[nbr]                      # (B, k, H, W)
    x = jnp.transpose(x, (0, 2, 3, 1))         # NHWC: channels = k slices
    y = store_masks[idx]                       # (B, H, W)
    return x.astype(jnp.float32), y


def epoch_permutation(key: jax.Array, num_slices: int, batch_size: int,
                      drop_last: bool = True) -> jnp.ndarray:
    """Shuffled (steps, batch) index matrix for one epoch (device-side RNG)."""
    perm = jax.random.permutation(key, num_slices)
    steps = num_slices // batch_size
    if not drop_last and steps * batch_size < num_slices:
        pad = (steps + 1) * batch_size - num_slices
        perm = jnp.concatenate([perm, perm[:pad]])
        steps += 1
    return perm[: steps * batch_size].reshape(steps, batch_size)


# ---------------------------------------------------------------------------
# Host-side compat dataset (reference KneeNPZ2DSlices surface)
# ---------------------------------------------------------------------------

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32).reshape(-1, 1, 1)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32).reshape(-1, 1, 1)


class KneeNPZ2DSlices:
    """Host-side per-slice dataset (reference src/dataio/datasets.py:44-133).

    Returns (x: (C,H,W) float32, y: (1,H,W) float32 binary | (H,W) int64
    multiclass) as NumPy arrays. Geometric augmentation is NOT applied here —
    in this framework augmentation runs on device inside the jitted train
    step (train/augment.py); the ``aug`` argument is accepted and recorded
    for config parity. Entire volumes are cached after first touch (the
    reference re-opened the npz per item).
    """

    def __init__(self, list_txt: str, k: int = 1, aug: str = "light",
                 imagenet_norm: bool = False, encoder_name: str = "resnet34"):
        assert k >= 1 and k % 2 == 1, "k must be odd (1,3,5,...)"
        self.files = read_list(list_txt)
        self.k = k
        self.aug = aug
        self.imagenet_norm = imagenet_norm
        self.encoder_name = encoder_name

        self.index: List[Tuple[int, int]] = []
        self._sizes: List[int] = []
        for fi, p in enumerate(self.files):
            with np.load(p) as z:
                s = int(z["img"].shape[0])
            self._sizes.append(s)
            self.index.extend((fi, si) for si in range(s))
        self._cache: dict = {}

    def __len__(self) -> int:
        return len(self.index)

    def _load_volume(self, file_idx: int):
        if file_idx not in self._cache:
            z = np.load(self.files[file_idx])
            self._cache[file_idx] = (z["img"].astype(np.float32),
                                     z["msk"].astype(np.int64))
        return self._cache[file_idx]

    def __getitem__(self, i: int):
        fi, s = self.index[i]
        img_vol, msk_vol = self._load_volume(fi)
        S = img_vol.shape[0]
        if self.k == 1:
            x = img_vol[s]                                     # (1,H,W)
        else:
            half = self.k // 2
            idxs = [min(max(s + d, 0), S - 1) for d in range(-half, half + 1)]
            x = np.concatenate([img_vol[j] for j in idxs], axis=0)
        y = msk_vol[s]

        if y.max() <= 1:
            y_out = y[None].astype(np.float32)                 # (1,H,W)
        else:
            y_out = y.astype(np.int64)                         # (H,W)

        x = x.astype(np.float32)
        if self.imagenet_norm and x.shape[0] == 1:
            x = np.repeat(x, 3, axis=0)
        if self.imagenet_norm:
            x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        return x, y_out
