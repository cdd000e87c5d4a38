"""Extract the REAL fastMRI knee panels committed in the reference run
into tests/goldens/fastmri_real_panels.npz.

Run from the repo root:  python tests/make_real_panels.py

The reference repo commits six sample grids from its real-data training run
(reference runs/fastmri_unet/samples/sample_000[0-5].png, written by
src/train/engine.py:141-216). Each grid is 1280x320 RGB = four 320x320
panels: Input | GT | Pred | Overlay, where

  * Input = min-max-normalized uint8 rendering of the network input x[i,0]
    (engine.py:53-55). The committed run used k=1, imagenet_norm=false
    (runs/fastmri_unet/args.json), so x IS the preprocessor's z-scored
    image; z-score is a global affine map (mri_preprocess.py:217-224), so
    the panel equals the min-max rendering of the percentile-clipped image
    at working resolution. fastMRI ESC targets are natively 320x320, so no
    resize intervened.
  * GT = the preprocessor's Otsu body mask (mri_preprocess.py:195-214)
    rendered as {0, 255} (engine.py:170-171).

That makes the PNGs a committed REAL-DATA oracle for the Dice-critical
body-mask function: feed Input/255 into the mask chain, compare with GT.
The fixture stores the raw panels so the tests run without the reference
mount.
"""
import os
import pathlib
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
from PIL import Image

SAMPLES = pathlib.Path("/root/reference/runs/fastmri_unet/samples")
OUT = pathlib.Path(__file__).parent / "goldens" / "fastmri_real_panels.npz"


def main() -> None:
    inputs, gts = [], []
    for i in range(6):
        a = np.asarray(Image.open(SAMPLES / f"sample_{i:04d}.png"))
        assert a.shape == (320, 1280, 3), a.shape
        inp = a[:, :320]
        gt = a[:, 320:640]
        # Input/GT panels are grayscale replicated across RGB, and GT is
        # strictly binary {0,255} (engine.py:170-171) — verify before
        # freezing.
        assert (inp[..., 0] == inp[..., 1]).all() and \
               (inp[..., 0] == inp[..., 2]).all()
        assert (gt[..., 0] == gt[..., 1]).all() and \
               (gt[..., 0] == gt[..., 2]).all()
        uniq = np.unique(gt[..., 0])
        assert set(uniq.tolist()) <= {0, 255}, uniq
        inputs.append(inp[..., 0])
        gts.append(gt[..., 0] > 127)
    np.savez_compressed(OUT, inputs=np.stack(inputs), gt_masks=np.stack(gts))
    print(f"wrote {OUT} inputs={np.stack(inputs).shape}")


if __name__ == "__main__":
    sys.exit(main())
