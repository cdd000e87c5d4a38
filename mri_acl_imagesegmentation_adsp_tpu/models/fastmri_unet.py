"""fastMRI-style plain U-Net (InstanceNorm + LeakyReLU), Flax/NHWC.

Capability target: vendored fastMRI_prostate
DL_reconstruction/models/unet.py:13-182 — the classic 4-pool U-Net used by
the VarNet cascades (wrapped as NormUnet) and the recon baseline:
ConvBlock = 2x(conv3x3 -> InstanceNorm -> LeakyReLU(0.2) -> dropout),
avg-pool 2x2 downsampling, transpose-conv 2x2 upsampling with skip concat.

Phase-space mode (``phase_max_chans``): levels whose feature count is at
or below the threshold run on the 4-phase space-to-depth representation
(models/phaseconv.py). At 8-36 channels these convs cannot fill the MXU's
128 lanes, so XLA repacks activations around EVERY conv — the r3 VarNet
HLO dump (scripts/dump_hlo_varnet.py) measured ~3.7 GB/step of such
copies, and the microbench (scripts/micro_cascade_conv.py) shows the
phase-major formulation is ~1.8x faster up to 36 channels (and loses at
72, hence the threshold). The lowerings are exact linear relowerings of
the SAME (3,3,Ci,Co) kernel parameters:
  - encoder conv1 from a normal-layout input: one stride-2 4x4 conv
    emitting phase-major output (strided_phase_kernel);
  - in-phase 3x3 convs: dense_embedded_kernel (per concat-split for the
    decoder's [up, skip] input);
  - avg_pool 2x2 == mean over the 4 phase channels (exact, free);
  - transpose-conv 2x2/2: 1x1 conv emitting the 4 phase groups
    (tconv_phase_kernel) WITHOUT the depth_to_space;
  - InstanceNorm: per original channel over (H/2, W/2, 4 phases) — the
    same element set as the naive norm (f32-reassociation-level equal).
Parameter names and shapes are IDENTICAL to the naive path (kernel
holders named Conv_i / ConvTranspose_0, norm scale/bias under
GroupNorm_i), so checkpoints and the two paths are interchangeable.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from .phaseconv import (apply_strided_phase, dense_embedded_kernel,
                        depth_to_space, strided_phase_kernel,
                        tconv_phase_kernel)

_conv_init = nn.initializers.he_normal()


class _Kernel(nn.Module):
    """Parameter-compatible stand-in for nn.Conv's kernel (no bias): owns
    the (3,3,Cin,Cout) parameter, caller does the (lowered) conv. Named
    "Conv_i" at call sites so parameter trees match the naive path."""
    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", _conv_init,
                          (3, 3, self.in_features, self.features),
                          jnp.float32)


class _PhaseInstanceNorm(nn.Module):
    """InstanceNorm on a phase-major (B, L, L', 4C) tensor: statistics per
    original channel over (L, L', 4 phases) — the same element set as
    nn.GroupNorm(group_size=1) on the (B, 2L, 2L', C) tensor. Stats in
    f32; scale/bias shaped (C,) to match the naive GroupNorm params."""
    features: int            # C (original channels)
    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, l, lp, f = x.shape
        c = self.features
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        x32 = x.astype(jnp.float32).reshape(b, l, lp, 4, c)
        mean = jnp.mean(x32, axis=(1, 2, 3), keepdims=True)
        var = jnp.mean(jnp.square(x32), axis=(1, 2, 3),
                       keepdims=True) - jnp.square(mean)
        y = (x32 - mean) * lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.reshape(b, l, lp, f).astype(self.dtype)


class ConvBlock(nn.Module):
    """2x(conv3x3 -> InstanceNorm -> LeakyReLU(0.2) -> dropout).

    ``phase=True`` runs the block in 4-phase space (see module docstring);
    input is normal-layout (conv1 becomes the strided phase-emitting conv)
    unless ``phase_splits`` names the normal-channel blocks of an already
    phase-major input (the decoder's [up, skip] concat). Phase output is
    phase-major at half resolution; requires drop_prob == 0."""
    features: int
    drop_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32
    phase: bool = False
    phase_splits: Tuple[int, ...] = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not self.phase:
            for _ in range(2):
                x = nn.Conv(self.features, (3, 3), padding="SAME",
                            use_bias=False, dtype=self.dtype,
                            kernel_init=_conv_init)(x)
                x = nn.GroupNorm(num_groups=None, group_size=1,
                                 dtype=self.dtype)(x)  # InstanceNorm
                x = nn.leaky_relu(x, negative_slope=0.2)
                if self.drop_prob > 0:
                    x = nn.Dropout(self.drop_prob,
                                   deterministic=not train)(x)
            return x

        assert self.drop_prob == 0, "phase blocks require drop_prob=0"
        f = self.features
        x = x.astype(self.dtype)
        if self.phase_splits:
            # phase-major input: dense-embed the kernel per concat block
            ci = sum(self.phase_splits)
            k1 = _Kernel(f, ci, name="Conv_0")().astype(self.dtype)
            parts, off = [], 0
            for s in self.phase_splits:
                parts.append(dense_embedded_kernel(k1[:, :, off:off + s]))
                off += s
            w1 = jnp.concatenate(parts, axis=2)        # (3,3,4Ci,4F)
            y = lax.conv_general_dilated(
                x, w1, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            # normal-layout input: stride-2 phase-emitting conv
            ci = x.shape[-1]
            k1 = _Kernel(f, ci, name="Conv_0")().astype(self.dtype)
            y = apply_strided_phase(x, strided_phase_kernel(k1))
        y = _PhaseInstanceNorm(f, dtype=self.dtype, name="GroupNorm_0")(y)
        y = nn.leaky_relu(y, negative_slope=0.2)
        k2 = _Kernel(f, f, name="Conv_1")().astype(self.dtype)
        y = lax.conv_general_dilated(
            y, dense_embedded_kernel(k2), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = _PhaseInstanceNorm(f, dtype=self.dtype, name="GroupNorm_1")(y)
        return nn.leaky_relu(y, negative_slope=0.2)


class TransposeConvBlock(nn.Module):
    """kernel-2 stride-2 transpose conv + InstanceNorm + LeakyReLU.

    ``fused=True`` lowers the transpose conv as a 1x1 conv emitting the 4
    phase groups + depth_to_space (models/phaseconv.py) — exactly equal
    (every output pixel is touched by exactly one tap) with the same
    "ConvTranspose_0/kernel" parameter, but the MXU sees a dense 1x1
    contraction instead of XLA's input-dilated lowering.
    ``phase_out=True`` keeps the phase-major tensor (no depth_to_space)
    and applies the norm per original channel over the 4 phases."""
    features: int
    dtype: jnp.dtype = jnp.float32
    fused: bool = True
    phase_out: bool = False

    @nn.compact
    def __call__(self, x):
        if self.fused or self.phase_out:
            k = self.param_holder(x.shape[-1])
            x = lax.conv_general_dilated(
                x.astype(self.dtype),
                tconv_phase_kernel(k).astype(self.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if self.phase_out:
                x = _PhaseInstanceNorm(self.features, dtype=self.dtype,
                                       name="GroupNorm_0")(x)
                return nn.leaky_relu(x, negative_slope=0.2)
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
    ``phase_max_chans`` > 0 phase-lowers every level at or below that
    feature count (see module docstring); 0 = naive everywhere. Parameter
    trees are identical for every setting."""
    out_chans: int = 1
    chans: int = 32
    num_pool_layers: int = 4
    drop_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32
    phase_max_chans: int = 0

    def _use_phase(self, ch: int, h: int, w: int) -> bool:
        return (self.phase_max_chans > 0 and ch <= self.phase_max_chans
                and self.drop_prob == 0 and h % 2 == 0 and w % 2 == 0)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        n, h, w, c = x.shape
        mult = 2 ** self.num_pool_layers
        ph_pad = (-h) % mult
        pw_pad = (-w) % mult
        if ph_pad or pw_pad:
            x = jnp.pad(x, ((0, 0), (0, ph_pad), (0, pw_pad), (0, 0)),
                        mode="reflect")

        skips = []
        skip_phase = []
        ch = self.chans
        for _ in range(self.num_pool_layers):
            if self._use_phase(ch, x.shape[1], x.shape[2]):
                z = ConvBlock(ch, 0.0, dtype=self.dtype, phase=True)(x, train)
                skips.append(z)
                skip_phase.append(True)
                b_, l, lp, _ = z.shape
                # avg_pool 2x2 == mean over the 4 phase channels (exact)
                x = jnp.mean(z.reshape(b_, l, lp, 4, ch), axis=3)
            else:
                x = ConvBlock(ch, self.drop_prob, dtype=self.dtype)(x, train)
                skips.append(x)
                skip_phase.append(False)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            ch *= 2
        x = ConvBlock(ch, self.drop_prob, dtype=self.dtype)(x, train)

        for skip, sph in zip(reversed(skips), reversed(skip_phase)):
            ch //= 2
            if sph:
                up = TransposeConvBlock(ch, dtype=self.dtype,
                                        phase_out=True)(x)
                cat = jnp.concatenate([up, skip], axis=-1)  # (l, l', 8ch)
                z = ConvBlock(ch, 0.0, dtype=self.dtype, phase=True,
                              phase_splits=(ch, ch))(cat, train)
                x = depth_to_space(z)
            else:
                x = TransposeConvBlock(ch, dtype=self.dtype)(x)
                x = jnp.concatenate([x, skip], axis=-1)
                x = ConvBlock(ch, self.drop_prob, dtype=self.dtype)(x, train)

        x = nn.Conv(self.out_chans, (1, 1), dtype=self.dtype,
                    kernel_init=_conv_init)(x)
        if ph_pad or pw_pad:
            x = x[:, :h, :w, :]
        return x.astype(jnp.float32)
