"""Segmentation inference CLI.

Fills the reference's intended-but-absent inference entry point
(src/infer/segment.py and src/cli.py are empty stubs; guide.txt:87 shows
`python -m src.infer --ckpt ...` — SURVEY.md C24).

Usage:
  python -m mri_acl_imagesegmentation_adsp_tpu.cli.infer \
      --ckpt runs/fastmri_unet/best.ckpt --list lists/val.txt \
      --out-dir preds [--metrics] [--batch-size 16]

Writes per-volume predicted masks (pred_mask.npy + probabilities) and, with
--metrics, on-device Dice/IoU/HD95/ASSD per volume + a summary JSON.
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from ..data.hbm_loader import read_list
from ..infer import segment_volume_2d, evaluate_volume
from ..models import build_unet
from ..train import checkpoint as ckpt_lib


def load_model_from_ckpt(ckpt_path: str):
    """Rebuild the model from the args bundled with the checkpoint."""
    import jax
    with open(ckpt_path + ".args.json", "r", encoding="utf-8") as f:
        args = json.load(f)
    in_ch = 3 if (args.get("k", 1) == 1 and args.get("imagenet_norm")) \
        else args.get("k", 1)
    model = build_unet(args.get("model", "unet"), args.get("encoder", "resnet34"),
                       "none", in_ch=in_ch, classes=args.get("classes", 1),
                       dtype=jnp.bfloat16 if args.get("amp") else jnp.float32)
    # template init to obtain target structures, then restore
    h = w = 64  # template spatial size; conv params are size-independent
    sample = jnp.zeros((1, h, w, in_ch), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sample, train=True)
    params, batch_stats = ckpt_lib.load_best(
        ckpt_path, variables["params"], variables.get("batch_stats", {}))
    return model, params, batch_stats, args


# the canonical transform lives in utils/imagenet.py (shared with the
# trainer so training and serving cannot desynchronize); re-exported here
# because cli.serve/cli.quantize import it from this module
from ..utils.imagenet import make_input_norm  # noqa: E402,F401


def main(argv=None) -> int:
    p = argparse.ArgumentParser("Whole-volume segmentation inference")
    p.add_argument("--ckpt", help="trained checkpoint (optional with "
                                  "--qtree: the artifact is self-contained)")
    p.add_argument("--list", dest="list_txt", required=True,
                   help="txt file of volume.npz paths")
    p.add_argument("--out-dir", default="preds")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--metrics", action="store_true",
                   help="compute dice/iou/hd95/assd vs the packed masks")
    p.add_argument("--save-probs", action="store_true")
    p.add_argument("--tta", choices=("none", "hflip"), default="none",
                   help="test-time augmentation: average probabilities "
                        "over the horizontal-flip orbit (2x compute, "
                        "typically a small Dice gain; matches the "
                        "training recipes' HorizontalFlip)")
    p.add_argument("--quant", choices=("none", "int8", "folded"),
                   default="none",
                   help="post-training quantized serving path "
                        "(infer/quant.py): int8 = w8a8 MXU convs, folded = "
                        "BN-folded weight-only int8 (float activations)")
    p.add_argument("--qtree",
                   help="pre-exported quantized artifact (cli.quantize); "
                        "serves without the original checkpoint")
    p.add_argument("--data-parallel", type=int, default=1,
                   help="shard each inference batch over N devices "
                        "(params replicated; batch rounds up to N)")
    p.add_argument("--ckpt3d",
                   help="3-D checkpoint (trainer3d best3d.ckpt): run "
                        "WHOLE-volume 3-D inference instead of 2-D slices")
    p.add_argument("--spatial-parallel", type=int, default=1,
                   help="with --ckpt3d: depth-shard the whole volume over "
                        "N devices (GSPMD halo exchange — volumes larger "
                        "than one chip's HBM)")
    args = p.parse_args(argv)
    if args.ckpt3d:
        return _run_3d(args)
    if not args.ckpt and not args.qtree:
        p.error("one of --ckpt / --qtree / --ckpt3d is required")

    if args.qtree:
        from .quantize import load_engine
        eng, qtree, meta = load_engine(args.qtree)
        if args.quant != "none" and args.quant != meta["mode"]:
            # an explicit --quant overrides the artifact's baked mode
            # (e.g. --quant folded on an int8 qtree = weight-only-dequant
            # sanity numerics); it was silently ignored before
            from ..infer.quant import QuantConfig, QuantizedUNet2D
            eng = QuantizedUNet2D(
                meta["encoder"], meta["classes"],
                tuple(meta["decoder_channels"]),
                QuantConfig(mode=args.quant,
                            compute_dtype=eng.config.compute_dtype),
                arch=meta["arch"])
        k, classes = meta["k"], meta["classes"]
        norm = make_input_norm(meta["imagenet_norm"])

        def apply_fn(x):
            return eng.apply(qtree, norm(x))

        out_err = _run(args, apply_fn, k, classes)
        return out_err

    model, params, batch_stats, margs = load_model_from_ckpt(args.ckpt)
    k = margs.get("k", 1)
    classes = margs.get("classes", 1)
    norm = make_input_norm(bool(margs.get("imagenet_norm")))

    if args.quant != "none":
        if margs.get("model", "unet") not in ("unet", "unetpp"):
            raise SystemExit("--quant supports the unet/unetpp families")
        from ..infer.quant import QuantConfig, QuantizedUNet2D
        from ..infer.segment import _neighbor_stack
        vols = read_list(args.list_txt)
        with np.load(vols[0]) as z:
            vol0 = z["img"].astype(np.float32)
        x0 = _neighbor_stack(jnp.asarray(vol0[:, 0]), k)[:16]
        calib = [np.asarray(norm(x0), np.float32)]
        eng, qtree = QuantizedUNet2D.from_model(
            model, {"params": params, "batch_stats": batch_stats}, calib,
            QuantConfig(mode=args.quant, compute_dtype=model.dtype))

        def apply_fn(x):
            return eng.apply(qtree, norm(x))
    else:
        def apply_fn(x):
            return model.apply(
                {"params": params, "batch_stats": batch_stats},
                norm(x), train=False)

    return _run(args, apply_fn, k, classes)


def _run_3d(args) -> int:
    """Whole-volume 3-D inference (optionally depth-sharded over a mesh).

    Beyond-reference capability: the reference 3-D path can only ROI-crop
    160x160x64 patches to fit one GPU (src/train/train_unet3d.py:39-54);
    here the FULL volume runs in one forward, sharded along the slice axis
    with --spatial-parallel N so per-device HBM holds 1/N of every
    activation (parallel/spatial.py:unet3d_depth_sharded_apply).
    """
    import jax
    from ..models import build_unet3d
    from ..infer import evaluate_volume

    with open(args.ckpt3d + ".args.json", "r", encoding="utf-8") as f:
        margs = json.load(f)
    classes = int(margs.get("classes", 1))
    model = build_unet3d(channels=tuple(margs.get("channels",
                                                  (32, 64, 128, 256, 320))),
                         classes=classes,
                         dtype=jnp.bfloat16 if margs.get("amp")
                         else jnp.float32)
    sample = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sample, train=True)
    params, batch_stats = ckpt_lib.load_best(
        args.ckpt3d, variables["params"], variables.get("batch_stats", {}))
    variables = {"params": params, "batch_stats": batch_stats}

    if args.spatial_parallel > 1:
        from ..parallel.spatial import (
            make_depth_mesh, unet3d_depth_sharded_apply)
        mesh = make_depth_mesh(args.spatial_parallel)
        runner = unet3d_depth_sharded_apply(model, variables, mesh)
    else:
        jfwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
        runner = lambda x: jfwd(variables, x)   # noqa: E731

    out_root = Path(args.out_dir)
    out_root.mkdir(parents=True, exist_ok=True)
    summary = []
    for path in read_list(args.list_txt):
        with np.load(path) as z:
            vol = z["img"].astype(np.float32)      # (S,1,H,W)
            gt = z["msk"].astype(np.uint8)
        # per-volume z-score (KneeNPZ3D._load semantics, trainer3d.py)
        mu, sd = float(vol.mean()), float(vol.std() + 1e-6)
        x = ((vol - mu) / sd)[None, :, 0, :, :, None]   # (1,S,H,W,1)
        # zero-pad (S,H,W) up to the model's 2^4 downsampling stride (the
        # transpose-conv up path doubles exactly, so each dim must divide
        # by 16); logits are cropped back below. Real fastMRI volumes are
        # 320x320 with S ~ 30-45, so the depth pad is the common case.
        s0, h0, w0 = x.shape[1:4]
        pads = [(0, -d % 16) for d in (s0, h0, w0)]
        if any(p[1] for p in pads):
            x = np.pad(x, [(0, 0), *pads, (0, 0)])
        logits = np.asarray(runner(jnp.asarray(x)), np.float32)
        logits = logits[:, :s0, :h0, :w0]
        if classes == 1:
            probs = 1.0 / (1.0 + np.exp(-logits[0, ..., 0]))   # (S,H,W)
            pred = (probs > args.threshold).astype(np.uint8)
        else:
            e = np.exp(logits[0] - logits[0].max(-1, keepdims=True))
            probs = e / e.sum(-1, keepdims=True)
            pred = np.argmax(probs, axis=-1).astype(np.uint8)

        vol_dir = out_root / Path(path).parent.name
        vol_dir.mkdir(parents=True, exist_ok=True)
        np.save(vol_dir / "pred_mask.npy", pred)
        if args.save_probs:
            np.savez_compressed(vol_dir / "probs.npz", probs=probs)
        entry = {"volume": path, "num_slices": int(vol.shape[0]),
                 "pred_path": str(vol_dir / "pred_mask.npy")}
        if args.metrics and classes == 1:
            entry.update(evaluate_volume(pred, gt))
        summary.append(entry)
        msg = (f"[infer3d] {Path(path).parent.name}: whole volume "
               f"{vol.shape[0]} slices"
               + (f" over {args.spatial_parallel} shards"
                  if args.spatial_parallel > 1 else ""))
        if "dice" in entry:
            msg += f" dice {entry['dice']:.4f}"
        print(msg)

    with (out_root / "summary.json").open("w", encoding="utf-8") as f:
        json.dump(summary, f, indent=2)
    return 0


def _run(args, apply_fn, k: int, classes: int) -> int:
    out_root = Path(args.out_dir)
    out_root.mkdir(parents=True, exist_ok=True)
    if args.metrics and classes != 1:
        print("[infer] WARNING: --metrics computes binary Dice/IoU/HD95/"
              "ASSD and is skipped for multiclass checkpoints "
              f"(classes={classes})")
    mesh = None
    if args.data_parallel > 1:
        from ..parallel import make_mesh
        mesh = make_mesh(args.data_parallel)
    summary = []
    for path in read_list(args.list_txt):
        with np.load(path) as z:
            vol = z["img"].astype(np.float32)      # (S,1,H,W)
            gt = z["msk"].astype(np.uint8)
        probs = segment_volume_2d(apply_fn, vol, k=k,
                                  batch_size=args.batch_size, classes=classes,
                                  mesh=mesh, tta=args.tta)
        if classes == 1:
            pred = (probs[:, 0] > args.threshold).astype(np.uint8)
        else:
            pred = np.argmax(probs, axis=1).astype(np.uint8)

        vol_dir = out_root / Path(path).parent.name
        vol_dir.mkdir(parents=True, exist_ok=True)
        np.save(vol_dir / "pred_mask.npy", pred)
        if args.save_probs:
            np.savez_compressed(vol_dir / "probs.npz", probs=probs)

        entry = {"volume": path, "num_slices": int(vol.shape[0]),
                 "pred_path": str(vol_dir / "pred_mask.npy")}
        if args.metrics and classes == 1:
            entry.update(evaluate_volume(pred, gt))
        summary.append(entry)
        msg = f"[infer] {Path(path).parent.name}: {vol.shape[0]} slices"
        if "dice" in entry:
            msg += f" dice {entry['dice']:.4f} hd95 {entry['hd95']:.2f}"
        print(msg)

    with (out_root / "summary.json").open("w", encoding="utf-8") as f:
        json.dump(summary, f, indent=2)
    if args.metrics and summary and "dice" in summary[0]:
        means = {k: float(np.mean([s[k] for s in summary]))
                 for k in ("dice", "iou", "hd95", "assd")}
        print("[infer] means:", json.dumps(means))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
