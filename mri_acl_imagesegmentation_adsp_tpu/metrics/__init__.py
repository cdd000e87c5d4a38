"""Report metrics (segmentation + reconstruction)."""

from .medimetrics import dice_bin, iou_bin, hd95, assd
from .recon_eval import mse, nmse, psnr, ssim, METRIC_FUNCS, Metrics

__all__ = ["dice_bin", "iou_bin", "hd95", "assd",
           "mse", "nmse", "psnr", "ssim", "METRIC_FUNCS", "Metrics"]
