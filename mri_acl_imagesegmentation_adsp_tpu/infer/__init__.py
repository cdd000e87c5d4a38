"""Inference: whole-volume 2-D segmentation + 3-D sliding window."""

from .segment import (segment_volume_2d, segment_volumes_2d,
                      sliding_window_3d, evaluate_volume)

__all__ = ["segment_volume_2d", "segment_volumes_2d",
           "sliding_window_3d", "evaluate_volume"]
