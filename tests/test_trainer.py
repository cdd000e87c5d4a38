"""End-to-end trainer tests on synthetic data (CPU, virtual devices).

The synthetic task mirrors the reference's real one: the target IS the
preprocessor's Otsu body mask, so a U-Net must reach high Dice quickly
(SURVEY.md §0 explains why the reference hits 0.975).
"""
import json
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

from oracles import synthetic_kspace_volume, write_fake_fastmri_h5

from mri_acl_imagesegmentation_adsp_tpu.data.adapters import FastMRISinglecoilAdapter
from mri_acl_imagesegmentation_adsp_tpu.data.packer import build_preprocess
from mri_acl_imagesegmentation_adsp_tpu.train.trainer import UNet2DArgs, UNet2DTrainer
from mri_acl_imagesegmentation_adsp_tpu.train.schedule import ReduceLROnPlateau

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def artifact_lists(tmp_path_factory):
    """Preprocess 4 fake volumes at 48x48 and write train/val lists."""
    rng = np.random.default_rng(7)
    tmp = tmp_path_factory.mktemp("e2e")
    root = tmp / "raw"
    root.mkdir()
    for i in range(4):
        ksp, _ = synthetic_kspace_volume(rng, s=6, h=64, w=48)
        write_fake_fastmri_h5(str(root / f"vol{i}.h5"), ksp)
    out = tmp / "artifacts"
    args = SimpleNamespace(root_dir=str(root), out_dir=str(out), height=48,
                           width=48, slice_keep="0.0,1.0", clip="1.0,99.5",
                           use_n4=False, use_denoise=False, preview_max=1)
    build_preprocess(args, FastMRISinglecoilAdapter(root_dir=str(root)))
    packs = sorted(str(p) for p in out.rglob("volume.npz"))
    train = tmp / "train.txt"
    val = tmp / "val.txt"
    train.write_text("\n".join(packs[:3]))
    val.write_text("\n".join(packs[3:]))
    return tmp, str(train), str(val)


def _args(tmp, train, val, out_name, **kw):
    defaults = dict(
        train_list=train, val_list=val, out_dir=str(Path(tmp) / out_name),
        k=1, aug="light", model="unet", encoder="resnet18",
        encoder_weights="none", classes=1, batch_size=4, epochs=2,
        lr=1e-3, weight_decay=1e-4, loss="dice_bce", amp=False, seed=2024,
        logger="csv", save_val_probs=False, max_grad_norm=5.0)
    defaults.update(kw)
    return UNet2DArgs(**defaults)


def test_train_end_to_end_artifacts_and_learning(artifact_lists):
    tmp, train, val = artifact_lists
    args = _args(tmp, train, val, "run1", save_val_probs=True, epochs=3)
    result = UNet2DTrainer(args).run()
    out = Path(args.out_dir)

    # reference artifact layout (train_unet.py:152-154,306-324)
    for name in ["args.json", "history.json", "summary.json",
                 "history_epoch.csv", "history_step.csv", "metrics.json",
                 "best.ckpt", "val_preds.npz"]:
        assert (out / name).exists(), name
    assert (out / "samples" / "sample_0000.png").exists()

    summary = json.loads((out / "summary.json").read_text())
    assert set(summary) == {"best", "final", "best_ckpt", "epochs"}
    assert summary["best"]["val_dice"] > 0.55, summary  # learning the mask
    hist = result["history"]
    assert len(hist) == 3
    # per-step CSV row count = steps/epoch * epochs (drop_last)
    steps = sum(1 for _ in open(out / "history_step.csv")) - 1
    n_train = 18  # 3 vols x 6 slices
    assert steps == (n_train // 4) * 3

    with np.load(out / "val_preds.npz") as z:
        assert z["probs"].shape[0] == 6
        assert z["gts"].shape == z["probs"].shape


def test_train_resume_continues(artifact_lists):
    tmp, train, val = artifact_lists
    args = _args(tmp, train, val, "run_resume", epochs=1, save_resume_every=1)
    UNet2DTrainer(args).run()
    # second phase: same out_dir, resume, 2 total epochs
    args2 = _args(tmp, train, val, "run_resume", epochs=2,
                  save_resume_every=1, resume=True)
    t2 = UNet2DTrainer(args2)
    assert t2.start_epoch == 2, "must resume after epoch 1"
    result = t2.run()
    assert result["history"][-1]["epoch"] == 2
    hist = json.loads((Path(args.out_dir) / "history.json").read_text())
    assert [h["epoch"] for h in hist] == [1, 2]


def test_train_data_parallel_mesh(artifact_lists):
    """8 virtual CPU devices on the mesh 'data' axis."""
    import jax
    assert len(jax.devices()) >= 8
    tmp, train, val = artifact_lists
    args = _args(tmp, train, val, "run_dp", epochs=1, batch_size=8,
                 data_parallel=8)
    result = UNet2DTrainer(args).run()
    assert np.isfinite(result["history"][0]["train_loss"])
    assert result["history"][0]["val_dice"] > 0


def test_multiclass_best_metric_key(artifact_lists):
    tmp, train, val = artifact_lists
    t = UNet2DTrainer.__new__(UNet2DTrainer)  # just the metric rule
    t.args = _args(tmp, train, val, "x", classes=1)
    assert t._metric_key(0.5, 0.9) == 0.9
    t.args = _args(tmp, train, val, "x", classes=3)
    assert t._metric_key(0.5, 0.9) == -0.5


def test_reduce_lr_on_plateau_matches_torch():
    """State machine vs torch.optim.lr_scheduler.ReduceLROnPlateau."""
    import torch
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1.0)
    ref = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.5, patience=3)
    mine = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=3)
    metrics = [1.0, 0.9, 0.9, 0.9, 0.9, 0.9, 0.5, 0.6, 0.6, 0.6, 0.6, 0.6,
               0.39, 0.39, 0.39]
    for m in metrics:
        ref.step(m)
        mine.step(m)
        assert abs(opt.param_groups[0]["lr"] - mine.lr) < 1e-9, m


def test_train_heavy_aug_25d_end_to_end(artifact_lists):
    """--aug heavy (elastic path) combined with k=3 neighbor stacking must
    train end-to-end and keep losses finite (VERDICT-r1 weak item: heavy
    aug + k>1 previously had only unit-level warp coverage)."""
    tmp, train, val = artifact_lists
    args = _args(tmp, train, val, "run_heavy_k3", aug="heavy", k=3, epochs=2)
    result = UNet2DTrainer(args).run()
    hist = result["history"]
    assert len(hist) == 2
    assert all(np.isfinite(h["train_loss"]) for h in hist)
    assert hist[-1]["val_dice"] > 0.3  # learning despite strong distortion
    out = Path(args.out_dir)
    assert json.loads((out / "args.json").read_text())["aug"] == "heavy"


def test_remat_flag_reaches_model(artifact_lists):
    """--remat plumbs UNet2DArgs.remat -> build_unet(remat=True) (the
    numerics equality itself is pinned in test_models)."""
    tmp, train, val = artifact_lists
    t = UNet2DTrainer(_args(tmp, train, val, "run_remat", remat=True))
    assert t.model.remat is True
    t2 = UNet2DTrainer(_args(tmp, train, val, "run_noremat"))
    assert t2.model.remat is False
