"""3-D residual U-Net (Flax, NDHWC), MONAI-UNet capability equivalent.

Capability target: reference src/train/train_unet3d.py:75-83 builds
``monai.networks.nets.UNet(spatial_dims=3, channels=(32,64,128,256,320),
strides=(2,2,2,2), num_res_units=2)`` — an encoder/decoder where each level
is a residual unit of two conv3x3x3 (stride on the first conv of the down
path) and the up path uses transpose convs followed by residual units.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

_conv_init = nn.initializers.he_normal()


class _ResUnit3D(nn.Module):
    features: int
    stride: int = 1
    num_convs: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda: nn.GroupNorm(num_groups=None, group_size=1,
                                    dtype=self.dtype)  # InstanceNorm (MONAI default)
        residual = x
        y = x
        for i in range(self.num_convs):
            s = self.stride if i == 0 else 1
            y = nn.Conv(self.features, (3, 3, 3), strides=(s, s, s),
                        padding="SAME", use_bias=True, dtype=self.dtype,
                        kernel_init=_conv_init)(y)
            y = norm()(y)
            y = nn.PReLU()(y)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(self.features, (1, 1, 1),
                               strides=(self.stride,) * 3, use_bias=True,
                               dtype=self.dtype, kernel_init=_conv_init)(residual)
        return y + residual


class ResidualUNet3D(nn.Module):
    """Patch-based 3-D U-Net; input NDHWC (batch, D, H, W, C)."""
    classes: int = 1
    channels: Sequence[int] = (32, 64, 128, 256, 320)
    num_res_units: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        chs = list(self.channels)
        depth = len(chs) - 1  # number of stride-2 levels

        skips = []
        y = x
        for i, ch in enumerate(chs[:-1]):
            stride = 1 if i == 0 else 2
            y = _ResUnit3D(ch, stride=stride, num_convs=self.num_res_units,
                           dtype=self.dtype)(y, train)
            skips.append(y)
        # bottleneck
        y = _ResUnit3D(chs[-1], stride=2, num_convs=self.num_res_units,
                       dtype=self.dtype)(y, train)

        for skip, ch in zip(reversed(skips), reversed(chs[:-1])):
            y = nn.ConvTranspose(ch, (2, 2, 2), strides=(2, 2, 2),
                                 dtype=self.dtype, kernel_init=_conv_init)(y)
            y = jnp.concatenate([y, skip], axis=-1)
            y = _ResUnit3D(ch, stride=1, num_convs=self.num_res_units,
                           dtype=self.dtype)(y, train)

        out = 1 if self.classes == 1 else self.classes
        logits = nn.Conv(out, (1, 1, 1), dtype=self.dtype,
                         kernel_init=_conv_init)(y)
        return logits.astype(jnp.float32)
