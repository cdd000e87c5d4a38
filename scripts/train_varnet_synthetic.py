"""Train a small VarNet on synthetic multi-coil data until it beats the
zero-filled adjoint baseline; commit the evidence under runs/varnet_synthetic/.

Proves the VarNet stack LEARNS (loss falls; NMSE/SSIM/PSNR beat the
zero-filled SENSE-adjoint recon of the same undersampled k-space), which
unit/step tests alone cannot. Mirrors the vendored training intent
(zip!DL_reconstruction/train_varnet_prostate.py:19-64) at toy scale.

Run from the repo root (CPU is fine):
    python scripts/train_varnet_synthetic.py
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from mri_acl_imagesegmentation_adsp_tpu.data.subsample import (
    EquispacedMaskFunc, apply_mask)
from mri_acl_imagesegmentation_adsp_tpu.data.transforms import (
    VarNetSample, center_crop)
from mri_acl_imagesegmentation_adsp_tpu.metrics.recon_eval import (
    nmse, psnr, ssim)
from mri_acl_imagesegmentation_adsp_tpu.train.varnet_trainer import (
    VarNetArgs, VarNetTrainer)

H = W = 96
COILS = 4
CROP = 64
OUT = "runs/varnet_synthetic"


def _fft2c(img2d: np.ndarray) -> np.ndarray:
    x = np.fft.ifftshift(img2d, axes=(-2, -1))
    x = np.fft.fft2(x, norm="ortho")
    return np.fft.fftshift(x, axes=(-2, -1))


def _ifft2c(ksp: np.ndarray) -> np.ndarray:
    x = np.fft.ifftshift(ksp, axes=(-2, -1))
    x = np.fft.ifft2(x, norm="ortho")
    return np.fft.fftshift(x, axes=(-2, -1))


def _sens_maps(rng) -> np.ndarray:
    """Smooth complex coil sensitivities, RSS-normalized to 1."""
    yy, xx = np.mgrid[:H, :W].astype(np.float32) / H
    maps = []
    centers = [(0.2, 0.2), (0.2, 0.8), (0.8, 0.2), (0.8, 0.8)]
    for c, (cy, cx) in enumerate(centers[:COILS]):
        mag = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / 0.35))
        phase = 2.0 * np.pi * (0.1 * c + 0.2 * (xx - cx) + 0.15 * (yy - cy))
        maps.append(mag * np.exp(1j * phase))
    m = np.stack(maps).astype(np.complex64)
    rss = np.sqrt(np.sum(np.abs(m) ** 2, axis=0, keepdims=True))
    return (m / np.maximum(rss, 1e-6)).astype(np.complex64)


def _phantom(rng) -> np.ndarray:
    """Random smooth multi-ellipse phantom in [0, 1]."""
    yy, xx = np.mgrid[:H, :W].astype(np.float32) / H
    img = np.zeros((H, W), np.float32)
    for _ in range(rng.integers(3, 6)):
        cy, cx = rng.uniform(0.25, 0.75, 2)
        ry, rx = rng.uniform(0.05, 0.25, 2)
        th = rng.uniform(0, np.pi)
        y, x = yy - cy, xx - cx
        u = np.cos(th) * x + np.sin(th) * y
        v = -np.sin(th) * x + np.cos(th) * y
        img += rng.uniform(0.3, 1.0) * ((u / rx) ** 2 + (v / ry) ** 2 < 1.0)
    img = np.clip(img, 0, 1.6) / 1.6
    # light smoothing so k-space energy is concentrated (MRI-like)
    k = _fft2c(img)
    fy = np.fft.fftshift(np.fft.fftfreq(H))[:, None]
    fx = np.fft.fftshift(np.fft.fftfreq(W))[None, :]
    k *= np.exp(-((fy ** 2 + fx ** 2) / (2 * 0.12 ** 2)))
    return np.abs(_ifft2c(k)).astype(np.float32)


def make_samples(n_vols: int, slices_per_vol: int, seed: int, tag: str):
    rng = np.random.default_rng(seed)
    mask_func = EquispacedMaskFunc(center_fractions=[0.06],
                                   accelerations=[6])
    sens = _sens_maps(rng)
    sens_pair = np.stack([sens.real, sens.imag], -1).astype(np.float32)
    samples, baselines = [], []
    for v in range(n_vols):
        for s in range(slices_per_vol):
            img = _phantom(rng)
            ksp = _fft2c(sens * img[None])                    # (C, H, W)
            pair = np.stack([ksp.real, ksp.imag], -1).astype(np.float32)
            masked, _ = apply_mask(pair, mask_func, seed=1000 + v)
            # zero-filled adjoint baseline: conj-sens combine of the iFFT
            mc = masked[..., 0] + 1j * masked[..., 1]
            zf = np.abs(np.sum(np.conj(sens) * _ifft2c(mc), axis=0))
            samples.append(VarNetSample(
                kspace=masked[:, None].astype(np.float32),    # (C, A=1, H, W, 2)
                target=img,
                espirit=sens_pair[:, None],
                fname=f"{tag}_vol{v}",
                slice_num=s,
                max_value=float(img.max()),
                crop_size=(H, W)))
            baselines.append(zf.astype(np.float32))
    return samples, baselines


def eval_baseline(samples, baselines):
    out = {"nmse": [], "ssim": [], "psnr": []}
    for sample, zf in zip(samples, baselines):
        tgt = center_crop(sample.target, (CROP, CROP))[None]
        pred = center_crop(zf, (CROP, CROP))[None]
        out["nmse"].append(nmse(tgt, pred))
        out["ssim"].append(ssim(tgt, pred, maxval=sample.max_value))
        out["psnr"].append(psnr(tgt, pred, maxval=sample.max_value))
    return {k: float(np.mean(v)) for k, v in out.items()}


def main():
    os.makedirs(OUT, exist_ok=True)
    train_ds, _ = make_samples(6, 8, seed=7, tag="train")
    val_ds, val_zf = make_samples(1, 8, seed=99, tag="val")

    base = eval_baseline(val_ds, val_zf)
    print("zero-filled baseline:", base, flush=True)

    args = VarNetArgs(out_dir=OUT, num_cascades=4, chans=8, sens_chans=4,
                      pools=3, sens_pools=3, lr=1e-3, epochs=30, crop=CROP,
                      amp=False, bvalue="custom")
    tr = VarNetTrainer(args, train_ds, val_ds)
    t0 = time.time()
    result = tr.fit()
    wall = time.time() - t0

    final = result["history"][-1]
    summary = {
        "config": {"H": H, "W": W, "coils": COILS, "crop": CROP,
                   "cascades": args.num_cascades, "chans": args.chans,
                   "sens_chans": args.sens_chans, "accel": 6,
                   "train_slices": len(train_ds), "val_slices": len(val_ds)},
        "baseline_zero_filled": base,
        "varnet_final": {k: final[k] for k in
                         ("nmse", "ssim", "psnr", "validation_loss")},
        "train_loss_first": result["history"][0]["train_loss"],
        "train_loss_last": final["train_loss"],
        "wall_s": round(wall, 1),
    }
    with open(f"{OUT}/history.json", "w") as f:
        json.dump(result["history"], f, indent=1)
    with open(f"{OUT}/summary.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1), flush=True)

    # sample grid: target | zero-filled | varnet
    from PIL import Image
    sample = val_ds[0]
    out_img = np.asarray(tr._fwd(
        tr.params, sample.kspace[None], sample.espirit[None]))[0]
    cols = [center_crop(sample.target, (CROP, CROP)),
            center_crop(val_zf[0], (CROP, CROP)),
            center_crop(out_img, (CROP, CROP))]
    u8 = [np.clip(c / max(1e-6, sample.max_value) * 255, 0, 255
                  ).astype(np.uint8) for c in cols]
    Image.fromarray(np.concatenate(u8, axis=1)).save(
        f"{OUT}/sample_target_zf_varnet.png")

    ok = (final["nmse"] < base["nmse"] and final["ssim"] > base["ssim"]
          and final["psnr"] > base["psnr"])
    print(f"beats zero-filled baseline on all three metrics: {ok}",
          flush=True)
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
