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
from jax import lax

_conv_init = nn.initializers.he_normal()


class _TConvKernel3(nn.Module):
    """Parameter-compatible stand-in for nn.ConvTranspose((2,2,2), s=2):
    owns the (2,2,2,Cin,Cout) kernel + bias; the caller lowers them as a
    1x1x1 phase conv + depth_to_space3 (models/phaseconv.py). Named
    "ConvTranspose_i" at the call site so parameter trees (and
    checkpoints) match the naive path exactly."""
    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", _conv_init,
                       (2, 2, 2, self.in_features, self.features),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


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
    # Lower each kernel-2 stride-2 transpose conv as a 1x1x1 conv emitting
    # the 8 phase groups + depth_to_space3 (exactly equal — every output
    # voxel is touched by exactly one tap). Parameter trees match the
    # naive nn.ConvTranspose path, so checkpoints interchange.
    fused_up: bool = True
    # Rematerialize each residual unit in the backward pass (jax.checkpoint
    # via nn.remat): at the reference patch config (batch 2, 160x160x64,
    # channels to 320) the un-rematerialized fwd+bwd needs ~27 GB of HBM —
    # past a v5e's 16 GB — while remat fits comfortably for ~1/3 extra
    # fwd FLOPs. No effect on inference (no backward pass).
    remat: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .phaseconv import depth_to_space3, tconv_phase_kernel3
        x = x.astype(self.dtype)
        chs = list(self.channels)
        depth = len(chs) - 1  # number of stride-2 levels
        # explicit names keep the nn.remat-wrapped units at the naive
        # "_ResUnit3D_i" module paths (remat would otherwise rename them
        # "Checkpoint_ResUnit3D_i" and break existing checkpoints)
        cnt = {"u": 0}

        def unit(ch, stride):
            cls = (nn.remat(_ResUnit3D, static_argnums=(2,)) if self.remat
                   else _ResUnit3D)
            m = cls(ch, stride=stride, num_convs=self.num_res_units,
                    dtype=self.dtype, name=f"_ResUnit3D_{cnt['u']}")
            cnt["u"] += 1
            return m

        skips = []
        y = x
        for i, ch in enumerate(chs[:-1]):
            stride = 1 if i == 0 else 2
            y = unit(ch, stride)(y, train)
            skips.append(y)
        # bottleneck
        y = unit(chs[-1], 2)(y, train)

        for n, (skip, ch) in enumerate(zip(reversed(skips),
                                           reversed(chs[:-1]))):
            if self.fused_up:
                k, b = _TConvKernel3(ch, y.shape[-1],
                                     name=f"ConvTranspose_{n}")()
                y = lax.conv_general_dilated(
                    y, tconv_phase_kernel3(k).astype(self.dtype),
                    (1, 1, 1), "VALID",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                y = depth_to_space3(y + jnp.tile(b, 8).astype(self.dtype))
            else:
                y = nn.ConvTranspose(ch, (2, 2, 2), strides=(2, 2, 2),
                                     dtype=self.dtype,
                                     kernel_init=_conv_init,
                                     name=f"ConvTranspose_{n}")(y)
            y = jnp.concatenate([y, skip], axis=-1)
            y = unit(ch, 1)(y, train)

        out = 1 if self.classes == 1 else self.classes
        logits = nn.Conv(out, (1, 1, 1), dtype=self.dtype,
                         kernel_init=_conv_init)(y)
        return logits.astype(jnp.float32)
