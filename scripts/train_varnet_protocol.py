"""Protocol-scale VarNet training stability evidence (VERDICT r3 next #7).

Trains the VENDORED protocol configuration — 10 cascades, chans 20,
sens_chans 8, pools 4 (zip!DL_reconstruction/train_varnet_prostate.py:119-127
defaults), 320x320 k-space, 12 coils, bf16 compute — for a few hundred
on-chip optimizer steps on synthetic multi-coil phantoms, and commits the
loss curve under runs/varnet_protocol_steps/. The r3 evidence was one
measured 86.8 ms/step plus a toy-scale (96^2, 4-coil, 4-cascade) learning
run; this run shows the HEADLINE configuration training stably.

Run (real TPU):  nohup python scripts/train_varnet_protocol.py \
                     > /tmp/varnet_protocol.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from mri_acl_imagesegmentation_adsp_tpu.utils.compile_cache import (
    enable_compilation_cache)

enable_compilation_cache()

import jax  # noqa: E402

from mri_acl_imagesegmentation_adsp_tpu.data.subsample import (  # noqa: E402
    EquispacedMaskFunc, apply_mask)
from mri_acl_imagesegmentation_adsp_tpu.data.transforms import (  # noqa: E402
    VarNetSample)
from mri_acl_imagesegmentation_adsp_tpu.train.varnet_trainer import (  # noqa: E402
    VarNetArgs, VarNetTrainer)

H = W = 320
COILS = 12
CROP = 100          # vendored VarNetModule center-crops 100x100 for the loss
TRAIN_SLICES = 24
VAL_SLICES = 4
EPOCHS = 13         # 13 x 24 = 312 optimizer steps
OUT = "runs/varnet_protocol_steps"


def _fft2c(img2d):
    x = np.fft.ifftshift(img2d, axes=(-2, -1))
    x = np.fft.fft2(x, norm="ortho")
    return np.fft.fftshift(x, axes=(-2, -1))


def _sens_maps(rng):
    yy, xx = np.mgrid[:H, :W].astype(np.float32) / H
    maps = []
    for c in range(COILS):
        ang = 2 * np.pi * c / COILS
        cy, cx = 0.5 + 0.45 * np.sin(ang), 0.5 + 0.45 * np.cos(ang)
        mag = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / 0.3))
        phase = 2.0 * np.pi * (0.07 * c + 0.2 * (xx - cx) + 0.15 * (yy - cy))
        maps.append(mag * np.exp(1j * phase))
    m = np.stack(maps).astype(np.complex64)
    rss = np.sqrt(np.sum(np.abs(m) ** 2, axis=0, keepdims=True))
    return (m / np.maximum(rss, 1e-6)).astype(np.complex64)


def _phantom(rng):
    yy, xx = np.mgrid[:H, :W].astype(np.float32) / H
    img = np.zeros((H, W), np.float32)
    for _ in range(rng.integers(4, 8)):
        cy, cx = rng.uniform(0.25, 0.75, 2)
        ry, rx = rng.uniform(0.05, 0.25, 2)
        th = rng.uniform(0, np.pi)
        y, x = yy - cy, xx - cx
        u = np.cos(th) * x + np.sin(th) * y
        v = -np.sin(th) * x + np.cos(th) * y
        img += rng.uniform(0.3, 1.0) * ((u / rx) ** 2 + (v / ry) ** 2 < 1.0)
    img = np.clip(img, 0, 1.6) / 1.6
    k = _fft2c(img)
    fy = np.fft.fftshift(np.fft.fftfreq(H))[:, None]
    fx = np.fft.fftshift(np.fft.fftfreq(W))[None, :]
    k *= np.exp(-((fy ** 2 + fx ** 2) / (2 * 0.12 ** 2)))
    x = np.fft.ifftshift(k, axes=(-2, -1))
    x = np.fft.ifft2(x, norm="ortho")
    return np.abs(np.fft.fftshift(x, axes=(-2, -1))).astype(np.float32)


def make_samples(n: int, seed: int, tag: str):
    rng = np.random.default_rng(seed)
    mask_func = EquispacedMaskFunc(center_fractions=[0.08],
                                   accelerations=[4])
    sens = _sens_maps(rng)
    sens_pair = np.stack([sens.real, sens.imag], -1).astype(np.float32)
    samples = []
    for s in range(n):
        img = _phantom(rng)
        ksp = _fft2c(sens * img[None])
        pair = np.stack([ksp.real, ksp.imag], -1).astype(np.float32)
        masked, _ = apply_mask(pair, mask_func, seed=1000 + s)
        samples.append(VarNetSample(
            kspace=masked[:, None].astype(np.float32),   # (C, A=1, H, W, 2)
            target=img,
            espirit=sens_pair[:, None],
            fname=f"{tag}{s:03d}",
            slice_num=0,
            max_value=float(img.max()),
            crop_size=(H, W)))
    return samples


def main():
    print("devices:", jax.devices(), flush=True)
    os.makedirs(OUT, exist_ok=True)
    train_ds = make_samples(TRAIN_SLICES, seed=21, tag="tr")
    val_ds = make_samples(VAL_SLICES, seed=77, tag="va")

    args = VarNetArgs(out_dir=OUT, num_cascades=10, pools=4, chans=20,
                      sens_pools=4, sens_chans=8, lr=1e-3, lr_step_size=40,
                      lr_gamma=0.1, weight_decay=0.0, epochs=EPOCHS,
                      crop=CROP, amp=True, bvalue="protocol-synthetic")
    tr = VarNetTrainer(args, train_ds, val_ds)
    t0 = time.time()
    result = tr.fit()
    wall = time.time() - t0

    hist = result["history"]
    losses = [h["train_loss"] for h in hist]
    steps_total = EPOCHS * TRAIN_SLICES
    summary = {
        "config": {"H": H, "W": W, "coils": COILS, "crop": CROP,
                   "cascades": 10, "chans": 20, "sens_chans": 8,
                   "pools": 4, "amp_bf16": True, "accel": 4,
                   "train_slices": TRAIN_SLICES, "epochs": EPOCHS,
                   "optimizer_steps": steps_total},
        "train_loss_first_epoch": losses[0],
        "train_loss_last_epoch": losses[-1],
        "monotone_trend": bool(losses[-1] < losses[0]),
        "stable": bool(np.isfinite(losses).all()),
        "final_val": {k: hist[-1][k]
                      for k in ("nmse", "ssim", "psnr", "validation_loss")},
        "wall_s": round(wall, 1),
        "s_per_step_epoch_avg": round(wall / steps_total, 3),
    }
    with open(f"{OUT}/history.json", "w") as f:
        json.dump(hist, f, indent=1)
    with open(f"{OUT}/summary.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1), flush=True)
    if not summary["stable"] or not summary["monotone_trend"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
