"""Golden tests for train.losses vs torch oracles.

smp/MONAI are not installed here, so smp-semantics oracles are independent
torch transcriptions of the smp formulas (DiceLoss binary/multiclass,
SoftBCEWithLogitsLoss, FocalLoss); the reference's own custom losses
(Tversky, FocalTversky — src/train/losses.py:10-33) are transcribed verbatim.
"""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from mri_acl_imagesegmentation_adsp_tpu.train.losses import (
    dice_loss_binary, soft_bce_loss, focal_loss_binary, tversky_loss,
    focal_tversky_loss, dice_loss_multiclass, cross_entropy_loss,
    LossManager, build_loss, compute_loss,
)


def _bin_batch(rng, n=4, h=24, w=24):
    logits = rng.standard_normal((n, 1, h, w)).astype(np.float32) * 2
    targets = (rng.random((n, 1, h, w)) > 0.6).astype(np.float32)
    return logits, targets


# ---------------- torch oracles ----------------

def torch_dice_binary(logits, targets, smooth=0.0, eps=1e-7):
    """smp.losses.DiceLoss(mode='binary', from_logits=True)."""
    lg, tg = torch.from_numpy(logits), torch.from_numpy(targets)
    bs = tg.size(0)
    p = torch.sigmoid(lg).view(bs, 1, -1)
    t = tg.view(bs, 1, -1)
    dims = (0, 2)
    inter = torch.sum(p * t, dim=dims)
    card = torch.sum(p + t, dim=dims)
    score = (2 * inter + smooth) / (card + smooth).clamp_min(eps)
    loss = 1.0 - score
    mask = t.sum(dims) > 0
    loss = loss * mask.to(loss.dtype)
    return float(loss.mean())


def torch_focal_binary(logits, targets, alpha=0.25, gamma=2.0):
    """smp focal_loss_with_logits (normalized=False, reduction=mean)."""
    lg = torch.from_numpy(logits).reshape(-1)
    tg = torch.from_numpy(targets).reshape(-1)
    logpt = -F.binary_cross_entropy_with_logits(lg, tg, reduction="none")
    pt = torch.exp(logpt)
    focal = (1.0 - pt).pow(gamma) * (-logpt)
    focal = focal * (alpha * tg + (1 - alpha) * (1 - tg))
    return float(focal.mean())


def torch_tversky(logits, targets, a=0.7, b=0.3, eps=1e-7):
    """Reference TverskyLoss forward, verbatim (losses.py:15-22)."""
    lg, tg = torch.from_numpy(logits), torch.from_numpy(targets)
    p = torch.sigmoid(lg)
    dims = (0, 2, 3)
    TP = (p * tg).sum(dims)
    FP = (p * (1 - tg)).sum(dims)
    FN = ((1 - p) * tg).sum(dims)
    tv = (TP + eps) / (TP + a * FP + b * FN + eps)
    return float(1 - tv.mean())


def torch_dice_multiclass(logits, targets, smooth=0.0, eps=1e-7):
    lg = torch.from_numpy(logits)
    tg = torch.from_numpy(targets).long()
    bs, c = lg.shape[0], lg.shape[1]
    p = lg.log_softmax(1).exp().view(bs, c, -1)
    t = F.one_hot(tg.view(bs, -1), c).permute(0, 2, 1).float()
    dims = (0, 2)
    inter = torch.sum(p * t, dim=dims)
    card = torch.sum(p + t, dim=dims)
    score = (2 * inter + smooth) / (card + smooth).clamp_min(eps)
    loss = 1.0 - score
    mask = t.sum(dims) > 0
    return float((loss * mask.to(loss.dtype)).mean())


# ---------------- tests ----------------

def test_dice_binary(rng):
    lg, tg = _bin_batch(rng)
    got = float(dice_loss_binary(jnp.asarray(lg), jnp.asarray(tg)))
    assert abs(got - torch_dice_binary(lg, tg)) < 1e-5


def test_dice_binary_absent_class_masked(rng):
    lg, _ = _bin_batch(rng)
    tg = np.zeros_like(lg)
    got = float(dice_loss_binary(jnp.asarray(lg), jnp.asarray(tg)))
    assert got == 0.0  # class absent everywhere -> masked to zero


def test_soft_bce(rng):
    lg, tg = _bin_batch(rng)
    expect = float(F.binary_cross_entropy_with_logits(
        torch.from_numpy(lg), torch.from_numpy(tg)))
    got = float(soft_bce_loss(jnp.asarray(lg), jnp.asarray(tg)))
    assert abs(got - expect) < 1e-6


def test_focal_binary(rng):
    lg, tg = _bin_batch(rng)
    got = float(focal_loss_binary(jnp.asarray(lg), jnp.asarray(tg)))
    assert abs(got - torch_focal_binary(lg, tg)) < 1e-6


def test_tversky(rng):
    lg, tg = _bin_batch(rng)
    got = float(tversky_loss(jnp.asarray(lg), jnp.asarray(tg)))
    assert abs(got - torch_tversky(lg, tg)) < 1e-6


def test_focal_tversky(rng):
    lg, tg = _bin_batch(rng)
    tl = torch_tversky(lg, tg)
    expect = tl ** 0.75
    got = float(focal_tversky_loss(jnp.asarray(lg), jnp.asarray(tg)))
    assert abs(got - expect) < 1e-5


def test_dice_multiclass(rng):
    lg = rng.standard_normal((3, 4, 16, 16)).astype(np.float32)
    tg = rng.integers(0, 4, (3, 16, 16)).astype(np.int32)
    got = float(dice_loss_multiclass(jnp.asarray(lg), jnp.asarray(tg)))
    assert abs(got - torch_dice_multiclass(lg, tg)) < 1e-5


def test_cross_entropy(rng):
    lg = rng.standard_normal((3, 4, 16, 16)).astype(np.float32)
    tg = rng.integers(0, 4, (3, 16, 16)).astype(np.int64)
    expect = float(F.cross_entropy(torch.from_numpy(lg), torch.from_numpy(tg)))
    got = float(cross_entropy_loss(jnp.asarray(lg), jnp.asarray(tg.astype(np.int32))))
    assert abs(got - expect) < 1e-5


def test_loss_manager_dice_bce_is_half_half(rng):
    lg, tg = _bin_batch(rng)
    lm = LossManager(classes=1, name="dice_bce")
    got = float(lm(jnp.asarray(lg), jnp.asarray(tg)))
    expect = 0.5 * torch_dice_binary(lg, tg) + 0.5 * float(
        F.binary_cross_entropy_with_logits(torch.from_numpy(lg), torch.from_numpy(tg)))
    assert abs(got - expect) < 1e-5


def test_loss_manager_all_names(rng):
    lg, tg = _bin_batch(rng)
    for name in ["dice_bce", "focal", "tversky", "focal_tversky"]:
        v = float(LossManager(classes=1, name=name)(jnp.asarray(lg), jnp.asarray(tg)))
        assert np.isfinite(v), name
    lg_mc = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    tg_mc = rng.integers(0, 3, (2, 8, 8)).astype(np.int32)
    for name in ["dice_ce", "ce"]:
        v = float(LossManager(classes=3, name=name)(jnp.asarray(lg_mc), jnp.asarray(tg_mc)))
        assert np.isfinite(v), name


def test_loss_manager_from_config_and_legacy_shims(rng):
    lg, tg = _bin_batch(rng)
    lm = LossManager.from_config({"classes": 1, "loss": "dice_bce",
                                  "loss_weights": [0.7, 0.3]})
    got = float(lm(jnp.asarray(lg), jnp.asarray(tg)))
    expect = 0.7 * torch_dice_binary(lg, tg) + 0.3 * float(
        F.binary_cross_entropy_with_logits(torch.from_numpy(lg), torch.from_numpy(tg)))
    assert abs(got - expect) < 1e-5

    legacy = build_loss(1, "dice_bce")
    assert abs(float(compute_loss(legacy, jnp.asarray(lg), jnp.asarray(tg)))
               - float(LossManager(1, "dice_bce")(jnp.asarray(lg), jnp.asarray(tg)))) < 1e-7


def test_loss_manager_rejects_unknown():
    import pytest
    with pytest.raises(ValueError):
        LossManager(classes=1, name="nope")
    with pytest.raises(ValueError):
        LossManager(classes=3, name="focal")


def torch_monai_dice_ce_multiclass(logits, targets,
                                   smooth_nr=1e-5, smooth_dr=1e-5):
    """MONAI DiceCELoss(softmax=True, to_onehot_y=True) transcription:
    per-sample per-class soft dice, include_background, batch=False, no
    absent-class masking; + CrossEntropy; lambda 1:1."""
    lg = torch.from_numpy(logits)
    tg = torch.from_numpy(targets)
    c = lg.shape[1]
    p = torch.softmax(lg, dim=1)
    t1h = F.one_hot(tg.long(), c).movedim(-1, 1).to(p.dtype)
    dims = tuple(range(2, lg.ndim))
    inter = (p * t1h).sum(dim=dims)
    denom = p.sum(dim=dims) + t1h.sum(dim=dims)
    dice = 1.0 - (2.0 * inter + smooth_nr) / (denom + smooth_dr)
    ce = F.cross_entropy(lg, tg.long())
    return float(dice.mean() + ce)


def test_dice_ce_3d_multiclass_matches_monai_transcription(rng):
    from mri_acl_imagesegmentation_adsp_tpu.train.losses import (
        dice_ce_loss_3d_multiclass)
    logits = rng.standard_normal((2, 3, 6, 10, 10)).astype(np.float32) * 2
    targets = rng.integers(0, 3, size=(2, 6, 10, 10)).astype(np.int32)
    # make class 2 absent in sample 0: it must STILL be penalized
    targets[0][targets[0] == 2] = 1
    want = torch_monai_dice_ce_multiclass(logits, targets)
    got = float(dice_ce_loss_3d_multiclass(jnp.asarray(logits),
                                           jnp.asarray(targets)))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # absent-class penalty sanity: predicting mass on the absent class
    # raises the loss (the smp-style masked dice would ignore it)
    boosted = logits.copy()
    boosted[0, 2] += 3.0
    got_boosted = float(dice_ce_loss_3d_multiclass(jnp.asarray(boosted),
                                                   jnp.asarray(targets)))
    assert got_boosted > got
