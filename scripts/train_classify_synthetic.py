"""Train the ConvNeXt classifier on synthetic ADC/b1500 slices to a
separable AUC, with EarlyStopping firing; evidence under
runs/classify_synthetic/.

Exercises the full classification stack the way the vendored suite does
(zip!fastmri_prostate_classification/: ConvNeXt 2-ch diffusion stem,
class-weighted BCE, AUC metric, EarlyStopping from pytorchtools.py:12-59)
but on synthetic data: positives carry a focal bright-b1500 / dark-ADC
lesion, the classic diffusion-restriction signature.

Run from the repo root (CPU):  python scripts/train_classify_synthetic.py
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

from mri_acl_imagesegmentation_adsp_tpu.classify.trainer import (
    ClassifierArgs, ClassifierTrainer, roc_auc)

H = W = 64
OUT = "runs/classify_synthetic"


class SyntheticDWIDataset:
    """(x: (2, H, W) float32 [b1500, ADC], y: float) with the
    _BaseSheetDataset batching/weights contract."""

    def __init__(self, n: int, pos_frac: float, seed: int):
        rng = np.random.default_rng(seed)
        self.xs, self.labels = [], []
        for i in range(n):
            label = int(rng.random() < pos_frac)
            b1500 = 0.3 + 0.1 * rng.standard_normal((H, W))
            adc = 1.2 + 0.15 * rng.standard_normal((H, W))
            if label:
                cy, cx = rng.uniform(0.3, 0.7, 2) * H
                rr = rng.uniform(4.0, 7.0)
                yy, xx = np.mgrid[:H, :W].astype(np.float32)
                blob = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2)
                              / (2 * rr * rr))
                b1500 = b1500 + 0.9 * blob        # restriction: bright b1500
                adc = adc - 0.8 * blob            # ... and dark ADC
            x = np.stack([b1500, adc]).astype(np.float32)
            self.xs.append(x)
            self.labels.append(label)
        self.labels = np.asarray(self.labels)
        neg_weight = float(np.mean(self.labels))
        self.weights = [neg_weight, 1 - neg_weight]

    def __len__(self):
        return len(self.xs)

    def __getitem__(self, i):
        return self.xs[i], np.float32(self.labels[i])

    def batches(self, batch_size: int, shuffle: bool, seed: int = 0):
        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for start in range(0, len(order), batch_size):
            chunk = order[start:start + batch_size]
            xs, ys = zip(*(self[int(i)] for i in chunk))
            yield np.stack(xs), np.stack(ys)


def main():
    os.makedirs(OUT, exist_ok=True)
    train_ds = SyntheticDWIDataset(160, pos_frac=0.35, seed=3)
    val_ds = SyntheticDWIDataset(48, pos_frac=0.35, seed=77)

    # epochs > useful-training horizon so EarlyStopping (patience 5) FIRES
    args = ClassifierArgs(out_dir=OUT, model="tiny", diff=True, lr=2e-4,
                          epochs=60, batch_size=16, patience=5, amp=False,
                          scheduler="exponentiallr", gamma=0.97)
    tr = ClassifierTrainer(args, train_ds, val_ds)
    t0 = time.time()
    result = tr.fit()
    wall = time.time() - t0

    hist = result["history"]
    best_auc = max(h["val_auc"] for h in hist)
    stopped_early = len(hist) < args.epochs
    summary = {
        "config": {"H": H, "W": W, "model": args.model, "diff": True,
                   "train_slices": len(train_ds), "val_slices": len(val_ds),
                   "pos_frac": 0.35, "patience": args.patience,
                   "epochs_max": args.epochs},
        "epochs_ran": len(hist),
        "early_stopping_fired": stopped_early,
        "best_val_auc": best_auc,
        "final_val_auc": hist[-1]["val_auc"],
        "final_val_loss": hist[-1]["val_loss"],
        "wall_s": round(wall, 1),
    }
    with open(f"{OUT}/summary.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1), flush=True)

    ok = best_auc > 0.9 and stopped_early
    print(f"separable AUC (>0.9) with early stop: {ok}", flush=True)
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
