"""Export a post-training-quantized serving artifact.

Serving capability beyond the reference (whose inference surface is an
empty stub — src/infer/segment.py, src/cli.py; SURVEY.md C24): fold
BatchNorm, calibrate activation scales on packed volumes, quantize to
per-channel int8, and write one .npz (int8 kernels + f32 scales/biases,
~4x smaller than the f32 checkpoint) plus a .meta.json sidecar carrying
everything needed to rebuild the engine without the original checkpoint.

Usage:
  python -m mri_acl_imagesegmentation_adsp_tpu.cli.quantize \
      --ckpt runs/fastmri_unet/best.ckpt --list lists/val.txt \
      --out runs/fastmri_unet/quant_int8.npz [--mode int8] \
      [--calib-batches 4] [--calib-batch-size 16]

Serve it with the infer CLI:  --quant int8 --qtree <out>.npz
"""

from __future__ import annotations

import argparse
import json

import numpy as np
import jax.numpy as jnp

from ..data.hbm_loader import read_list
from ..infer.quant import QuantConfig, QuantizedUNet2D, save_qtree
from ..infer.segment import _neighbor_stack
from .infer import load_model_from_ckpt, make_input_norm


def calibration_batches(list_txt: str, k: int, norm, n_batches: int,
                        batch_size: int):
    """Representative NHWC batches from the head of the packed volumes —
    the same preprocessed/z-scored tensors inference sees."""
    batches = []
    for path in read_list(list_txt):
        if len(batches) >= n_batches:
            break
        with np.load(path) as z:
            vol = z["img"].astype(np.float32)          # (S,1,H,W)
        x = _neighbor_stack(jnp.asarray(vol[:, 0]), k)[:batch_size]
        batches.append(np.asarray(norm(x), np.float32))
    if not batches:
        raise SystemExit(f"no volumes in {list_txt}")
    return batches


def main(argv=None) -> int:
    p = argparse.ArgumentParser("Quantize a trained 2-D U-Net for serving")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--list", dest="list_txt", required=True,
                   help="txt file of volume.npz paths (calibration data)")
    p.add_argument("--out", required=True, help="output .npz artifact path")
    p.add_argument("--mode", choices=("int8", "folded"), default="int8")
    p.add_argument("--calib-batches", type=int, default=4)
    p.add_argument("--calib-batch-size", type=int, default=16)
    args = p.parse_args(argv)

    # canonical artifact path: np.savez appends .npz to the data file, so
    # normalize up front or the meta sidecar lands at a name load_engine
    # can never pair with the data under any --qtree spelling
    if not args.out.endswith(".npz"):
        args.out += ".npz"

    model, params, batch_stats, margs = load_model_from_ckpt(args.ckpt)
    if margs.get("model", "unet") not in ("unet", "unetpp"):
        raise SystemExit("quantize supports the unet/unetpp families")
    k = margs.get("k", 1)
    norm = make_input_norm(bool(margs.get("imagenet_norm")))

    calib = calibration_batches(args.list_txt, k, norm,
                                args.calib_batches, args.calib_batch_size)
    eng, qtree = QuantizedUNet2D.from_model(
        model, {"params": params, "batch_stats": batch_stats}, calib,
        QuantConfig(mode=args.mode, compute_dtype=model.dtype))
    save_qtree(args.out, qtree)

    meta = {
        "arch": eng.arch, "encoder": eng.encoder, "classes": eng.classes,
        "decoder_channels": list(eng.decoder_channels), "mode": args.mode,
        "compute_dtype": jnp.dtype(model.dtype).name,
        "k": k, "imagenet_norm": bool(margs.get("imagenet_norm")),
        "calib": {"list": args.list_txt, "batches": len(calib),
                  "batch_size": args.calib_batch_size},
        "source_ckpt": args.ckpt,
    }
    with open(args.out + ".meta.json", "w", encoding="utf-8") as f:
        json.dump(meta, f, indent=2)
    n_int8 = sum(int(np.prod(l["w_q"].shape)) for l in qtree.values())
    print(f"[quantize] {args.out}: {len(qtree)} convs, "
          f"{n_int8 / 1e6:.1f} M int8 weights, mode={args.mode}")
    return 0


def load_engine(qtree_path: str):
    """Rebuild (engine, qtree) from an exported artifact + its sidecar.
    Accepts the path with or without the .npz suffix."""
    from ..infer.quant import load_qtree
    if not qtree_path.endswith(".npz"):
        qtree_path += ".npz"
    with open(qtree_path + ".meta.json", "r", encoding="utf-8") as f:
        meta = json.load(f)
    eng = QuantizedUNet2D(
        meta["encoder"], meta["classes"], tuple(meta["decoder_channels"]),
        QuantConfig(mode=meta["mode"],
                    compute_dtype=jnp.dtype(meta["compute_dtype"])),
        arch=meta["arch"])
    return eng, load_qtree(qtree_path), meta


if __name__ == "__main__":
    raise SystemExit(main())
