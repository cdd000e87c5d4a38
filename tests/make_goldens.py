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


def otsu_adversarial_images():
    """Extreme-histogram fixtures for the Otsu threshold.

    All are [0, 1]-normalized, matching the only way the reference ever
    invokes threshold_otsu (mri_preprocess.py:199-202 normalizes first).
    Chosen to stress the histogram bin-assignment corner cases the real
    skimage would exercise: two-spike histograms (balanced, unbalanced,
    adjacent bins), values exactly on bin edges, a single-outlier histogram
    (everything in bin 0 + one pixel in bin 255), and a huge-dynamic-range
    image whose normalization collapses the body into one bin.
    """
    rng = np.random.default_rng(31337)
    h = w = 64
    cases = {}

    two = np.zeros((h, w), np.float32)
    two[:, w // 2:] = 1.0
    cases["two_spike_balanced"] = two

    unb = np.zeros((h, w), np.float32)
    unb.flat[:17] = 1.0                      # 17 of 4096 pixels high
    cases["two_spike_unbalanced"] = unb

    adj = np.full((h, w), 128.0 / 255.0, np.float32)
    adj[::2, ::2] = 129.0 / 255.0            # spikes in adjacent bins
    adj[0, 0], adj[-1, -1] = 0.0, 1.0        # pin the range to [0, 1]
    cases["two_spike_adjacent_bins"] = adj

    edges = (rng.integers(0, 256, (h, w)).astype(np.float32) / 255.0)
    cases["values_on_bin_edges"] = edges

    out1 = np.zeros((h, w), np.float32)
    out1[h // 2, w // 2] = 1.0               # single pixel in the last bin
    cases["single_outlier"] = out1

    big = rng.random((h, w)).astype(np.float32)
    big[3, 3] = 1e30                         # normalization crushes the rest
    bign = big - big.min()
    cases["huge_dynamic_range_normalized"] = (bign / bign.max()).astype(
        np.float32)

    ramp = np.linspace(0.0, 1.0, h * w, dtype=np.float32).reshape(h, w)
    cases["linear_ramp"] = ramp

    tri = np.clip(rng.normal(0.3, 0.08, (h, w)), 0, 1).astype(np.float32)
    tri[rng.random((h, w)) > 0.9] = 1.0      # heavy tail spike
    tri[0, 0] = 0.0
    cases["gaussian_plus_spike"] = tri
    return cases


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

    adv = {}
    for name, img in otsu_adversarial_images().items():
        adv[f"img_{name}"] = img
        adv[f"otsu_{name}"] = np.float64(np_otsu(img))
        adv[f"mask_{name}"] = np_body_mask(img).astype(np.uint8)
    out2 = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "goldens", "otsu_adversarial.npz")
    np.savez_compressed(out2, **adv)
    print(f"wrote {len(adv)} arrays -> {out2}")


if __name__ == "__main__":
    main()
