"""Regenerate tests/goldens/preprocess_goldens.npz.

Run from the repo root:  python tests/make_goldens.py

The fixtures are deterministic synthetic knee slices (seed 777); the
expected outputs are produced with the REAL libraries available in this
image — scipy.ndimage (morphology with skimage border semantics, labeling,
distance_transform_edt) and torch (F.interpolate bilinear,
align_corners=False) — plus the documented skimage threshold_otsu algorithm
(skimage itself is not installed here; its Otsu is a short published
histogram argmax, transcribed in oracles.np_otsu). If an environment with
real scikit-image becomes available, rerun there: the outputs must not
change.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from scipy import ndimage as ndi

from oracles import np_body_mask, np_otsu, np_resize, synthetic_knee


def main() -> None:
    rng = np.random.default_rng(777)
    data = {}
    for i in range(8):
        img = synthetic_knee(rng).astype(np.float32)
        v = img - img.min()
        v = v / v.max()
        data[f"img_{i}"] = img
        data[f"mask_{i}"] = np_body_mask(img).astype(np.uint8)
        data[f"otsu_{i}"] = np.float64(np_otsu(v))
        data[f"resize_{i}"] = np_resize(img, (96, 80))
        m = data[f"mask_{i}"].astype(bool)
        data[f"edt_{i}"] = ndi.distance_transform_edt(~m).astype(np.float32)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "goldens", "preprocess_goldens.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, **data)
    print(f"wrote {len(data)} arrays -> {out}")


if __name__ == "__main__":
    main()
