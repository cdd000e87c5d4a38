"""Report metrics."""

from .medimetrics import dice_bin, iou_bin, hd95, assd

__all__ = ["dice_bin", "iou_bin", "hd95", "assd"]
