"""Generate a protocol-scale synthetic fastMRI-format corpus.

VERDICT r4 task #2: the reference's committed run trains on 973 volumes /
11,200 train slices per epoch (BASELINE.md). This writes N single-coil
knee-like volumes (default 125 x 112 slices at 368x320 k-space) as
fastMRI-layout .h5 files — at the default 80/20 split that is 11,200 TRAIN
slices/epoch, the reference's exact epoch size — so the FULL launcher
(preprocess -> split -> train -> infer/eval) can be exercised at corpus
scale on the real TPU.

Slices are synthetic knee phantoms (tests/oracles.py synthetic_knee): a
bright anatomical blob on noisy background whose Otsu body mask is the
segmentation target, exactly the reference's learning problem (SURVEY §0).

Resumable: volumes are seeded per-index and existing files are skipped.

Usage: python scripts/make_corpus.py --out /root/corpus/raw \
           [--volumes 125] [--slices 112] [--height 368] [--width 320]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from oracles import synthetic_kspace_volume, write_fake_fastmri_h5  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--volumes", type=int, default=125)
    ap.add_argument("--slices", type=int, default=112)
    ap.add_argument("--height", type=int, default=368)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--seed", type=int, default=2024)
    ns = ap.parse_args()

    os.makedirs(ns.out, exist_ok=True)
    t0 = time.time()
    for i in range(ns.volumes):
        path = os.path.join(ns.out, f"vol{i:04d}.h5")
        if os.path.exists(path):
            continue
        rng = np.random.default_rng(ns.seed + i)
        ksp, imgs = synthetic_kspace_volume(rng, s=ns.slices, h=ns.height,
                                            w=ns.width)
        write_fake_fastmri_h5(path + ".tmp", ksp, target=imgs)
        os.replace(path + ".tmp", path)
        if (i + 1) % 10 == 0:
            print(f"[corpus] {i + 1}/{ns.volumes} volumes "
                  f"({time.time() - t0:.0f}s)", flush=True)
    n_slices = ns.volumes * ns.slices
    print(f"[corpus] done: {ns.volumes} volumes x {ns.slices} slices = "
          f"{n_slices} slices at {ns.height}x{ns.width} "
          f"({time.time() - t0:.0f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
