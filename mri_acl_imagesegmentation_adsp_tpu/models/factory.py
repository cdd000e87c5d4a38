"""Model factories mirroring the reference's build surface.

Parity targets:
  - build_unet   : reference src/models/unet_factory.py:4-32
                   (model in {unet, unetpp}, any supported encoder,
                   encoder_weights accepted-but-"none" like the committed run)
  - build_unet3d : reference src/train/train_unet3d.py:75-83
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from .unet2d import ResNetEncoderUNet, UNetPlusPlus
from .unet3d import ResidualUNet3D


def build_unet(
    model: str = "unet",
    encoder: str = "resnet34",
    encoder_weights: str = "none",
    in_ch: int = 1,          # informational: Flax convs infer input channels
    classes: int = 1,
    dtype: jnp.dtype = jnp.float32,
    **kw,
):
    """Build a 2-D segmentation U-Net.

    ``encoder_weights`` other than none/null is rejected: pretrained torch
    encoder weights are not portable to this framework (the reference's
    committed run used encoder_weights="none").
    """
    del in_ch  # Flax infers input channel count at init time
    if str(encoder_weights).lower() not in ("none", "null"):
        raise ValueError(
            "pretrained encoder weights are not supported in the TPU build; "
            "use encoder_weights='none' (the reference's benchmark config)")
    m = model.lower()
    if m == "unet":
        return ResNetEncoderUNet(encoder=encoder, classes=classes, dtype=dtype, **kw)
    if m in ("unetpp", "unetplusplus"):
        return UNetPlusPlus(encoder=encoder, classes=classes, dtype=dtype, **kw)
    raise ValueError(f"Unsupported model: {model}")


def build_unet3d(
    in_ch: int = 1,
    classes: int = 1,
    channels: Sequence[int] = (32, 64, 128, 256, 320),
    dtype: jnp.dtype = jnp.float32,
):
    del in_ch
    return ResidualUNet3D(classes=classes, channels=tuple(channels), dtype=dtype)
