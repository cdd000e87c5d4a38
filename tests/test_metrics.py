"""Tests for in-loop metrics vs the reference Engine's torch math."""
import numpy as np
import jax.numpy as jnp
import torch

from mri_acl_imagesegmentation_adsp_tpu.train.metrics import (
    bin_dice_iou, dice_bin, iou_bin,
)


def torch_bin_metrics(preds, masks, eps=1e-7):
    """Reference engine._bin_metrics, verbatim (engine.py:42-50)."""
    preds, masks = torch.from_numpy(preds), torch.from_numpy(masks)
    dims = (0, 2, 3)
    inter = (preds * masks).sum(dims)
    dice = (2 * inter + eps) / (preds.sum(dims) + masks.sum(dims) + eps)
    iou = (inter + eps) / ((preds + masks - preds * masks).sum(dims) + eps)
    return float(dice.mean()), float(iou.mean())


def test_bin_dice_iou_matches_engine(rng):
    preds = (rng.random((5, 1, 20, 20)) > 0.5).astype(np.float32)
    masks = (rng.random((5, 1, 20, 20)) > 0.5).astype(np.float32)
    gd, gi = bin_dice_iou(jnp.asarray(preds), jnp.asarray(masks))
    ed, ei = torch_bin_metrics(preds, masks)
    assert abs(float(gd) - ed) < 1e-6
    assert abs(float(gi) - ei) < 1e-6


def test_report_dice_iou_match_medimetrics(rng):
    pred = (rng.random((32, 32)) > 0.5).astype(np.uint8)
    gt = (rng.random((32, 32)) > 0.5).astype(np.uint8)
    eps = 1e-7
    inter = (pred & gt).sum()
    e_dice = (2 * inter + eps) / (pred.sum() + gt.sum() + eps)
    union = pred.sum() + gt.sum() - inter
    e_iou = (inter + eps) / (union + eps)
    assert abs(float(dice_bin(jnp.asarray(pred), jnp.asarray(gt))) - e_dice) < 1e-6
    assert abs(float(iou_bin(jnp.asarray(pred), jnp.asarray(gt))) - e_iou) < 1e-6
