"""Tests for multicoil preprocess, report exporter, split CLI, recon U-Net."""
import json
from pathlib import Path

import numpy as np
import pytest

from oracles import np_preprocess_slice


def test_multicoil_preprocess_rss_parity(rng):
    """(C,H,W) k-space record -> ifft2c+RSS -> same chain as single-coil
    run on the RSS image (BASELINE configs[1])."""
    from mri_acl_imagesegmentation_adsp_tpu.data.preprocess import (
        MRIKneePreprocessor)
    h, w, nc = 64, 48, 4
    img = np.abs(rng.standard_normal((h, w))).astype(np.float32)
    coils = np.stack([img * (0.5 + 0.5 * c / nc) for c in range(nc)])
    ksp = np.fft.fftshift(np.fft.fft2(np.fft.ifftshift(
        coils, axes=(-2, -1)), axes=(-2, -1), norm="ortho"),
        axes=(-2, -1)).astype(np.complex64)

    pre = MRIKneePreprocessor(out_size=(32, 32))
    out = pre.preprocess_record({"kspace": ksp, "meta": {}})
    assert out["source"] == "kspace"

    # oracle: RSS image -> image-source record through the same preprocessor
    rss = np.sqrt((np.abs(np.fft.fftshift(np.fft.ifft2(np.fft.ifftshift(
        ksp, axes=(-2, -1)), axes=(-2, -1), norm="ortho"),
        axes=(-2, -1))) ** 2).sum(0)).astype(np.float32)
    ref = pre.preprocess_record({"image": rss, "meta": {}})
    np.testing.assert_allclose(out["img_z"], ref["img_z"], rtol=1e-3,
                               atol=1e-3)
    assert (out["mask"] != ref["mask"]).mean() < 0.01


def test_report_exporter(tmp_path, rng):
    from mri_acl_imagesegmentation_adsp_tpu.report import export_run_report
    run = tmp_path / "run"
    (run / "samples").mkdir(parents=True)
    history = [{"epoch": e, "train_loss": 1.0 / e, "val_loss": 1.1 / e,
                "val_dice": 1 - 0.5 / e, "val_iou": 1 - 0.6 / e,
                "lr": 1e-3} for e in range(1, 6)]
    (run / "history.json").write_text(json.dumps(history))
    (run / "summary.json").write_text(json.dumps(
        {"best": history[-1], "final": history[-1], "best_ckpt": "x",
         "epochs": 5}))
    (run / "args.json").write_text(json.dumps({"encoder": "resnet34"}))
    from PIL import Image
    Image.fromarray((rng.random((20, 80, 3)) * 255).astype(np.uint8)).save(
        run / "samples" / "sample_0000.png")

    out = export_run_report(str(run))
    html = Path(out).read_text()
    assert "Best epoch" in html and "resnet34" in html
    assert "data:image/png;base64" in html
    assert "<svg" in html
    metrics = json.loads((run / "report_metrics.json").read_text())
    assert metrics["epochs"] == 5


def test_generate_split_cli(tmp_path, rng, monkeypatch):
    from mri_acl_imagesegmentation_adsp_tpu.cli.generate_split import main
    art = tmp_path / "art"
    for v in range(5):
        d = art / f"vol{v}"
        d.mkdir(parents=True)
        np.savez(d / "volume.npz", img=np.zeros((2, 1, 4, 4), np.float32),
                 msk=np.zeros((2, 4, 4), np.uint8))
    monkeypatch.chdir(tmp_path)
    rc = main(["--artifact-dir", str(art), "--output-dir",
               str(tmp_path / "lists"), "--ratio", "0.8", "--seed", "42"])
    assert rc == 0
    train = (tmp_path / "lists" / "train.txt").read_text().splitlines()
    val = (tmp_path / "lists" / "val.txt").read_text().splitlines()
    assert len(train) == 4 and len(val) == 1
    assert len((tmp_path / "all.txt").read_text().splitlines()) == 5
    # deterministic seed-42 split
    rc = main(["--artifact-dir", str(art), "--output-dir",
               str(tmp_path / "lists2")])
    assert (tmp_path / "lists2" / "train.txt").read_text() == "\n".join(train)


@pytest.mark.slow
def test_unet_recon_trainer_smoke(tmp_path, rng):
    from mri_acl_imagesegmentation_adsp_tpu.train.unet_recon_trainer import (
        UnetReconArgs, UnetReconTrainer, unet_transform)
    samples = []
    for s in range(4):
        tgt = np.abs(rng.standard_normal((32, 32))).astype(np.float32)
        noisy = tgt + 0.3 * rng.standard_normal((32, 32)).astype(np.float32)
        samples.append(unet_transform(noisy, tgt, "v.h5", s, float(tgt.max())))
    assert abs(samples[0].image.mean()) < 1e-5  # instance-normalized

    args = UnetReconArgs(out_dir=str(tmp_path), chans=4, num_pool_layers=2,
                         epochs=3, batch_size=2, amp=False)
    t = UnetReconTrainer(args, samples, samples)
    result = t.fit()
    hist = result["history"]
    assert len(hist) == 3
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]
    assert Path(result["best_ckpt"]).exists()
