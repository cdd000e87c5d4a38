"""In-loop metrics (jnp), matching the reference Engine's math.

Parity targets:
  - bin_dice_iou : reference src/train/engine.py:42-50 (_bin_metrics):
    batch-global Dice/IoU over dims (0,2,3) with eps=1e-7, mean over the
    channel axis. Thresholding (sigmoid > 0.5) happens in the caller, as in
    engine.validate (engine.py:132).
  - report metrics dice_bin/iou_bin : reference src/metrics/medimetrics.py:8-16.
"""

from __future__ import annotations

import jax.numpy as jnp


def bin_dice_iou(preds: jnp.ndarray, masks: jnp.ndarray,
                 eps: float = 1e-7) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dice & IoU for binary (N, 1, H, W) {0,1} tensors (batch-global)."""
    p = preds.astype(jnp.float32)
    m = masks.astype(jnp.float32)
    dims = (0, 2, 3)
    inter = jnp.sum(p * m, axis=dims)
    dice = (2.0 * inter + eps) / (jnp.sum(p, axis=dims) + jnp.sum(m, axis=dims) + eps)
    iou = (inter + eps) / (jnp.sum(p + m - p * m, axis=dims) + eps)
    return jnp.mean(dice), jnp.mean(iou)


def dice_bin(pred: jnp.ndarray, gt: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Report-level Dice on a single (H,W) {0,1} pair (medimetrics.py:8-11)."""
    p = pred.astype(jnp.float32)
    g = gt.astype(jnp.float32)
    inter = jnp.sum(p * g)
    return (2.0 * inter + eps) / (jnp.sum(p) + jnp.sum(g) + eps)


def iou_bin(pred: jnp.ndarray, gt: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Report-level IoU on a single (H,W) {0,1} pair (medimetrics.py:13-16)."""
    p = pred.astype(jnp.float32)
    g = gt.astype(jnp.float32)
    inter = jnp.sum(p * g)
    union = jnp.sum(p) + jnp.sum(g) - inter
    return (inter + eps) / (union + eps)
