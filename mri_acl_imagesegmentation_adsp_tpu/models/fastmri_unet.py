"""fastMRI-style plain U-Net (InstanceNorm + LeakyReLU), Flax/NHWC.

Capability target: vendored fastMRI_prostate
DL_reconstruction/models/unet.py:13-182 — the classic 4-pool U-Net used by
the VarNet cascades (wrapped as NormUnet) and the recon baseline:
ConvBlock = 2x(conv3x3 -> InstanceNorm -> LeakyReLU(0.2) -> dropout),
avg-pool 2x2 downsampling, transpose-conv 2x2 upsampling with skip concat.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

_conv_init = nn.initializers.he_normal()


class ConvBlock(nn.Module):
    features: int
    drop_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, kernel_init=_conv_init)(x)
            x = nn.GroupNorm(num_groups=None, group_size=1,
                             dtype=self.dtype)(x)  # InstanceNorm == GN(group_size=1)
            x = nn.leaky_relu(x, negative_slope=0.2)
            if self.drop_prob > 0:
                x = nn.Dropout(self.drop_prob, deterministic=not train)(x)
        return x


class TransposeConvBlock(nn.Module):
    """kernel-2 stride-2 transpose conv + InstanceNorm + LeakyReLU.

    ``fused=True`` lowers the transpose conv as a 1x1 conv emitting the 4
    phase groups + depth_to_space (models/phaseconv.py) — exactly equal
    (every output pixel is touched by exactly one tap) with the same
    "ConvTranspose_0/kernel" parameter, but the MXU sees a dense 1x1
    contraction instead of XLA's input-dilated lowering."""
    features: int
    dtype: jnp.dtype = jnp.float32
    fused: bool = True

    @nn.compact
    def __call__(self, x):
        if self.fused:
            from .phaseconv import depth_to_space, tconv_phase_kernel
            k = self.param_holder(x.shape[-1])
            x = lax.conv_general_dilated(
                x.astype(self.dtype),
                tconv_phase_kernel(k).astype(self.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = depth_to_space(x)
        else:
            x = nn.ConvTranspose(self.features, (2, 2), strides=(2, 2),
                                 use_bias=False, dtype=self.dtype,
                                 kernel_init=_conv_init,
                                 name="ConvTranspose_0")(x)
        x = nn.GroupNorm(num_groups=None, group_size=1, dtype=self.dtype)(x)
        return nn.leaky_relu(x, negative_slope=0.2)

    def param_holder(self, in_features: int):
        class _K(nn.Module):
            features: int
            in_features: int

            @nn.compact
            def __call__(self):
                return self.param(
                    "kernel", _conv_init,
                    (2, 2, self.in_features, self.features), jnp.float32)

        return _K(self.features, in_features, name="ConvTranspose_0")()


class FastMRIUnet(nn.Module):
    """U-Net with ``num_pool_layers`` levels, channel doubling from ``chans``.

    NHWC in/out; logits in float32. Odd input dims are reflect-padded and
    cropped back (vendored unet.py pads with reflect on odd dims).
    """
    out_chans: int = 1
    chans: int = 32
    num_pool_layers: int = 4
    drop_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        n, h, w, c = x.shape
        mult = 2 ** self.num_pool_layers
        ph = (-h) % mult
        pw = (-w) % mult
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")

        skips = []
        ch = self.chans
        for _ in range(self.num_pool_layers):
            x = ConvBlock(ch, self.drop_prob, dtype=self.dtype)(x, train)
            skips.append(x)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            ch *= 2
        x = ConvBlock(ch, self.drop_prob, dtype=self.dtype)(x, train)

        for skip in reversed(skips):
            ch //= 2
            x = TransposeConvBlock(ch, dtype=self.dtype)(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = ConvBlock(ch, self.drop_prob, dtype=self.dtype)(x, train)

        x = nn.Conv(self.out_chans, (1, 1), dtype=self.dtype,
                    kernel_init=_conv_init)(x)
        if ph or pw:
            x = x[:, :h, :w, :]
        return x.astype(jnp.float32)
