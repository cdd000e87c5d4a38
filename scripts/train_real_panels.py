"""REAL-fastMRI-data training run artifact (closes PARITY C25 as far as
this environment permits).

The reference's value proof is a real-data training run
(reference runs/fastmri_unet: Dice 0.97473 over 973 volumes). No fastMRI
dataset exists in this environment — but the reference COMMITS six real
knee slices at the working 320x320 resolution inside its sample grids
(runs/fastmri_unet/samples/sample_000[0-5].png; extraction documented in
tests/make_real_panels.py), each paired with the preprocessor's Otsu body
mask (the training target, src/preprocess/mri_preprocess.py:195-214).

This script runs the actual production trainer on that real data:

  * panels -> the production preprocess chain (percentile clip -> Otsu
    mask -> z-score; MRIKneePreprocessor.preprocess_volume_images) ->
    volume.npz packs, exactly the artifact layout the launcher writes;
  * train on 4 slices / validate on 2 HELD-OUT slices (the same
    volume-level split semantics as generate_split);
  * reference model/loss/optimizer config (unet/resnet34 enc, dice_bce,
    AdamW 1e-3/1e-4, AMP), epochs scaled to the tiny set;
  * artifacts -> runs/fastmri_unet_realdata/ (args.json, history.json,
    summary.json, history_epoch.csv, best.ckpt, sample grids), committed.

Six slices is not 973 volumes — the committed summary is labeled
accordingly — but every number in it is measured on REAL fastMRI knee
data through the full production path, on the real TPU when available.
"""
import json
import os
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

GOLDEN = REPO / "tests" / "goldens" / "fastmri_real_panels.npz"
OUT = REPO / "runs" / "fastmri_unet_realdata"


def main() -> int:
    z = np.load(GOLDEN)
    inputs = z["inputs"].astype(np.float32) / 255.0     # (6,320,320)
    gts = z["gt_masks"]

    from mri_acl_imagesegmentation_adsp_tpu.data.preprocess import (
        MRIKneePreprocessor)
    from mri_acl_imagesegmentation_adsp_tpu.train.trainer import (
        UNet2DArgs, UNet2DTrainer)

    pp = MRIKneePreprocessor(slice_keep=(0.0, 1.0), out_size=(320, 320))
    out = pp.preprocess_volume_images(inputs)
    tensor = np.asarray(out["tensor"], np.float32)       # (6,1,320,320)
    masks = np.asarray(out["mask"], np.uint8)            # (6,320,320)

    # our chain's mask must match the reference's committed GT before we
    # train on it (same gate as tests/test_real_panels.py)
    for i in range(6):
        a, b = masks[i].astype(bool), gts[i].astype(bool)
        dice = 2.0 * (a & b).sum() / max(a.sum() + b.sum(), 1)
        assert dice >= 0.99, f"panel {i}: mask dice {dice:.4f} vs committed GT"

    work = OUT / "artifacts"
    lists = OUT / "lists"
    for d in (work, lists):
        d.mkdir(parents=True, exist_ok=True)
    # volume-level split: slices 0-3 -> train pack, 4-5 -> val pack
    splits = {"train": slice(0, 4), "val": slice(4, 6)}
    for name, sl in splits.items():
        vd = work / f"real_{name}"
        vd.mkdir(exist_ok=True)
        np.savez_compressed(vd / "volume.npz",
                            img=tensor[sl], msk=masks[sl])
        (lists / f"{name}.txt").write_text(str(vd / "volume.npz") + "\n")

    args = UNet2DArgs(
        train_list=str(lists / "train.txt"),
        val_list=str(lists / "val.txt"),
        out_dir=str(OUT),
        epochs=30, batch_size=2, lr=1e-3, weight_decay=1e-4,
        model="unet", encoder="resnet34", encoder_weights="none",
        loss="dice_bce", aug="light", k=1, imagenet_norm=False,
        classes=1, amp=True, seed=2024, logger="csv",
    )
    trainer = UNet2DTrainer(args)
    trainer.run()

    with open(OUT / "summary.json", "r", encoding="utf-8") as f:
        summary = json.load(f)
    summary["data_provenance"] = (
        "REAL fastMRI knee slices committed in the reference's sample "
        "grids (runs/fastmri_unet/samples, extracted per "
        "tests/make_real_panels.py): 4 train / 2 held-out val slices, "
        "targets = the reference preprocessor's committed Otsu body "
        "masks; our chain's masks verified Dice>=0.99 against them "
        "before training")
    import jax
    summary["platform"] = jax.devices()[0].platform
    with open(OUT / "summary.json", "w", encoding="utf-8") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({"best_val_dice": summary["best"]["val_dice"],
                      "platform": summary["platform"]}))

    # keep the committed artifact small: drop the working packs (the
    # fixture regenerates them) and the ~94 MB best.ckpt — the reference
    # strips its best.pt the same way (runs/fastmri_unet/.MISSING_LARGE_BLOBS)
    import shutil
    shutil.rmtree(work)
    ckpt = OUT / "best.ckpt"
    if ckpt.exists():
        ckpt.unlink()
        (OUT / ".MISSING_LARGE_BLOBS").write_text(
            "best.ckpt stripped for repo size (94 MB); regenerate with "
            "scripts/train_real_panels.py\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
