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


def validate_encoder_weights(encoder_weights) -> str | None:
    """Normalize the factory's ``encoder_weights``: None for random init,
    else the validated checkpoint path."""
    import os

    ew = str(encoder_weights)
    if ew.lower() in ("none", "null"):
        return None
    if os.path.exists(ew):
        return ew
    if ew.lower() == "imagenet":
        raise ValueError(
            "encoder_weights='imagenet' needs a weight download; this "
            "environment has no network. Pass a local torch ResNet "
            "checkpoint path instead (torchvision state_dict layout; smp "
            "'encoder.'-prefixed checkpoints also load)")
    raise ValueError(
        f"encoder_weights {encoder_weights!r} is neither 'none' nor an "
        "existing checkpoint file")


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

    ``encoder_weights`` (reference src/models/unet_factory.py:12-30
    semantics): "none"/"null" = random init (the committed benchmark run's
    config); a filesystem path = a torch ResNet ``state_dict`` checkpoint
    the trainer imports into the encoder after init
    (models/torch_import.py — torchvision layout, smp ``encoder.`` prefix
    accepted). "imagenet" is rejected with guidance: there is no weight
    zoo reachable from this environment, so the download smp performs must
    be replaced by pointing at a local checkpoint file.
    """
    del in_ch  # Flax infers input channel count at init time
    validate_encoder_weights(encoder_weights)
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
