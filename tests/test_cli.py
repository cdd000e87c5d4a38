"""CLI tests: infer CLI end-to-end, args.json replay compatibility, smoke."""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from oracles import synthetic_kspace_volume, write_fake_fastmri_h5


def test_reference_args_json_replays():
    """The committed reference run config must construct UNet2DArgs
    unchanged (SURVEY.md §5.6 replay contract)."""
    from mri_acl_imagesegmentation_adsp_tpu.train.trainer import UNet2DArgs
    ref = Path("/root/reference/runs/fastmri_unet/args.json")
    if not ref.exists():
        pytest.skip("reference artifacts not mounted")
    args = UNet2DArgs(**json.loads(ref.read_text()))
    assert args.batch_size == 8
    assert args.loss == "dice_bce"
    assert args.encoder == "resnet34"
    assert args.seed == 2024
    assert args.amp is True
    assert args.aug == "light"


def test_launcher_help_runs():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m",
         "mri_acl_imagesegmentation_adsp_tpu.cli.launcher", "--help"],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert out.returncode == 0
    for flag in ["--skip-preprocess", "--slice-keep", "--encoder",
                 "--data-parallel", "--resume"]:
        assert flag in out.stdout


def test_launcher_preset_overlay():
    """--preset tuned-v5e applies the measured b128 bundle; explicit flags
    win over the preset (launcher.apply_preset contract)."""
    from mri_acl_imagesegmentation_adsp_tpu.cli.launcher import (
        apply_preset, build_parser)

    parser = build_parser()
    argv = ["--preset", "tuned-v5e", "--skip-preprocess", "--skip-split",
            "--skip-train"]
    ns = apply_preset(parser, parser.parse_args(argv), argv)
    assert ns.batch_size == 128
    assert abs(ns.lr - 4e-3) < 1e-12
    assert ns.amp is True and ns.aug == "light"   # untouched defaults

    argv2 = argv + ["--batch-size", "32", "--lr=2e-3"]
    ns2 = apply_preset(parser, parser.parse_args(argv2), argv2)
    assert ns2.batch_size == 32      # explicit flag beats the preset
    assert abs(ns2.lr - 2e-3) < 1e-12   # --flag=value form detected too

    argv3 = ["--skip-preprocess", "--skip-split", "--skip-train"]
    ns3 = apply_preset(parser, parser.parse_args(argv3), argv3)
    assert ns3.batch_size == 8       # no preset -> reference defaults


def test_jax_platforms_env_honored_in_subprocess():
    """Importing the package makes JAX_PLATFORMS effective even though
    sitecustomize pre-imports jax (so CLI subprocesses asked to run on CPU
    never silently land on the TPU relay)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c",
         "import mri_acl_imagesegmentation_adsp_tpu, jax; "
         "print(jax.devices()[0].platform)"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=120)
    assert out.returncode == 0, out.stderr[-800:]
    assert out.stdout.strip().splitlines()[-1] == "cpu"


@pytest.mark.slow
def test_infer_cli_end_to_end(tmp_path, rng):
    """Train a tiny model via the trainer, then run the infer CLI on it."""
    from types import SimpleNamespace
    from mri_acl_imagesegmentation_adsp_tpu.data.adapters import (
        FastMRISinglecoilAdapter)
    from mri_acl_imagesegmentation_adsp_tpu.data.packer import build_preprocess
    from mri_acl_imagesegmentation_adsp_tpu.train.trainer import (
        UNet2DArgs, UNet2DTrainer)
    from mri_acl_imagesegmentation_adsp_tpu.cli.infer import main as infer_main

    root = tmp_path / "raw"
    root.mkdir()
    for i in range(2):
        ksp, _ = synthetic_kspace_volume(rng, s=6, h=64, w=48)
        write_fake_fastmri_h5(str(root / f"v{i}.h5"), ksp)
    art = tmp_path / "art"
    build_preprocess(SimpleNamespace(
        root_dir=str(root), out_dir=str(art), height=48, width=48,
        slice_keep="0.0,1.0", clip="1.0,99.5", use_n4=False,
        use_denoise=False, preview_max=1),
        FastMRISinglecoilAdapter(root_dir=str(root)))
    packs = sorted(str(p) for p in art.rglob("volume.npz"))
    lst = tmp_path / "all.txt"
    lst.write_text("\n".join(packs))

    args = UNet2DArgs(train_list=str(lst), val_list=str(lst),
                      out_dir=str(tmp_path / "run"), encoder="resnet18",
                      epochs=2, batch_size=4, amp=False, logger="noop")
    UNet2DTrainer(args).run()

    out_dir = tmp_path / "preds"
    rc = infer_main(["--ckpt", str(tmp_path / "run" / "best.ckpt"),
                     "--list", str(lst), "--out-dir", str(out_dir),
                     "--metrics"])
    assert rc == 0
    summary = json.loads((out_dir / "summary.json").read_text())
    assert len(summary) == 2
    assert all("dice" in s for s in summary)
    # trained 2 epochs on the easy body-mask task -> meaningful dice
    assert np.mean([s["dice"] for s in summary]) > 0.5
    pred = np.load(summary[0]["pred_path"])
    assert pred.shape == (6, 48, 48)
    assert pred.dtype == np.uint8

    # data-parallel inference over the virtual mesh == single-device preds
    dp_dir = tmp_path / "preds_dp"
    rc = infer_main(["--ckpt", str(tmp_path / "run" / "best.ckpt"),
                     "--list", str(lst), "--out-dir", str(dp_dir),
                     "--data-parallel", "8"])
    assert rc == 0
    dp_summary = json.loads((dp_dir / "summary.json").read_text())
    np.testing.assert_array_equal(np.load(dp_summary[0]["pred_path"]), pred)

    # quantized serving path: int8 predictions must agree with f32
    qdir = tmp_path / "preds_q"
    rc = infer_main(["--ckpt", str(tmp_path / "run" / "best.ckpt"),
                     "--list", str(lst), "--out-dir", str(qdir),
                     "--quant", "int8"])
    assert rc == 0
    qsummary = json.loads((qdir / "summary.json").read_text())
    qpred = np.load(qsummary[0]["pred_path"])
    inter = np.sum((qpred > 0) & (pred > 0))
    dice = 2.0 * inter / max(qpred.sum() + pred.sum(), 1)
    assert dice > 0.97, f"int8 CLI prediction dice vs f32: {dice}"

    # export a serving artifact, then serve from it WITHOUT the checkpoint
    from mri_acl_imagesegmentation_adsp_tpu.cli.quantize import (
        main as quantize_main)
    qpath = tmp_path / "quant_int8.npz"
    # one 16-slice calib batch == the inline --quant path's calibration,
    # so the artifact must reproduce its predictions exactly
    rc = quantize_main(["--ckpt", str(tmp_path / "run" / "best.ckpt"),
                        "--list", str(lst), "--out", str(qpath),
                        "--calib-batches", "1"])
    assert rc == 0 and qpath.exists()
    meta = json.loads((tmp_path / "quant_int8.npz.meta.json").read_text())
    assert meta["mode"] == "int8" and meta["arch"] == "unet"
    adir = tmp_path / "preds_artifact"
    rc = infer_main(["--qtree", str(qpath), "--list", str(lst),
                     "--out-dir", str(adir)])
    assert rc == 0
    apred = np.load(json.loads(
        (adir / "summary.json").read_text())[0]["pred_path"])
    # same engine + same quantized weights -> identical predictions
    np.testing.assert_array_equal(apred, qpred)


@pytest.mark.slow  # 17 s subprocess e2e; CLI surface covered by fast test_cli cases
def test_smoke_script(tmp_path, rng):
    from mri_acl_imagesegmentation_adsp_tpu.utils.smoke import run_smoke
    root = tmp_path / "raw"
    root.mkdir()
    ksp, _ = synthetic_kspace_volume(rng, s=4, h=64, w=48)
    write_fake_fastmri_h5(str(root / "v.h5"), ksp)
    out = run_smoke(str(root))
    assert np.isfinite(out["loss"])
    assert out["img_shape"] == (320, 320)
