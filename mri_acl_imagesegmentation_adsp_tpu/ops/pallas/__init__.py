"""Pallas TPU kernels for hot ops (with interpret-mode CPU fallback)."""

from .morphology import fused_open_close

__all__ = ["fused_open_close"]
