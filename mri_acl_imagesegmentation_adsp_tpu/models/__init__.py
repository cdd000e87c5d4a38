"""Flax model zoo.

Capability parity with the reference's model factories:
  - build_unet (smp Unet/UnetPlusPlus, any resnet encoder, no pretrain):
    reference src/models/unet_factory.py:4-32 -> :func:`factory.build_unet`
  - build_unet3d (MONAI residual U-Net): reference
    src/train/train_unet3d.py:75-83 -> :func:`factory.build_unet3d`
  - fastMRI U-Net (InstanceNorm/LeakyReLU) for recon paths: vendored
    DL_reconstruction/models/unet.py -> :class:`fastmri_unet.FastMRIUnet`
"""

from .unet2d import ResNetEncoderUNet, UNetPlusPlus
from .unet3d import ResidualUNet3D
from .fastmri_unet import FastMRIUnet
from .factory import build_unet, build_unet3d

__all__ = [
    "ResNetEncoderUNet", "UNetPlusPlus", "ResidualUNet3D", "FastMRIUnet",
    "build_unet", "build_unet3d",
]
