"""Multiclass (classes>1) training path e2e — dice_ce loss, argmax samples,
best-by-negative-val-loss selection (reference train_unet.py:221-222)."""
import pytest
import json
from pathlib import Path

import numpy as np

pytestmark = pytest.mark.slow


def test_multiclass_training_end_to_end(tmp_path, rng):
    from mri_acl_imagesegmentation_adsp_tpu.train.trainer import (
        UNet2DArgs, UNet2DTrainer)
    files = []
    for v in range(2):
        img = rng.standard_normal((6, 1, 32, 32)).astype(np.float32)
        # 3-class target derived from intensity bands (learnable)
        msk = np.digitize(img[:, 0], [-0.4, 0.4]).astype(np.uint8)  # 0,1,2
        d = tmp_path / f"v{v}"
        d.mkdir()
        np.savez(d / "volume.npz", img=img, msk=msk)
        files.append(str(d / "volume.npz"))
    lst = tmp_path / "l.txt"
    lst.write_text("\n".join(files))

    args = UNet2DArgs(train_list=str(lst), val_list=str(lst),
                      out_dir=str(tmp_path / "mc"), encoder="resnet18",
                      classes=3, loss="dice_ce", epochs=3, batch_size=4,
                      amp=False, logger="csv", aug="none")
    t = UNet2DTrainer(args)
    result = t.run()
    hist = result["history"]
    # learning: val loss decreases
    assert hist[-1]["val_loss"] < hist[0]["val_loss"]
    # binary metrics are not computed for multiclass (reference behavior)
    assert all(h["val_dice"] == 0.0 for h in hist)
    # best selected by -val_loss
    best = result["summary"]["best"]
    assert best["val_loss"] == min(h["val_loss"] for h in hist)
    # multiclass sample grids written (colorized path)
    assert (tmp_path / "mc" / "samples" / "sample_0000.png").exists()

    # val probs are softmax over 3 channels
    probs = t.engine.predict_probs(
        t.state, np.zeros((2, 32, 32, 1), np.float32))
    assert probs.shape == (2, 3, 32, 32)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)
