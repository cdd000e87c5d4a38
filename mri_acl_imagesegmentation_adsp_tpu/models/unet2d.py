"""2-D segmentation U-Nets (Flax linen, NHWC, bf16-capable).

Capability target: reference src/models/unet_factory.py:4-32 builds
``smp.Unet`` / ``smp.UnetPlusPlus`` with a ResNet encoder (default resnet34,
no pretrained weights) — an encoder/decoder with BatchNorm and skip
connections. This module provides the same model family designed TPU-first:

  * NHWC layout end-to-end (TPU conv layout; channels land on the 128-lane
    axis of the MXU),
  * parameterized compute dtype: params live in f32, activations/convs can
    run in bf16 (replaces torch AMP + GradScaler — bf16 needs no loss
    scaling),
  * static, compiler-friendly control flow only (pure module tree; all
    shapes static under jit).

Architecture mirrors the smp design it replaces (so capacity/behavior
match): ResNet encoder stages [stem /2, pool+layer1 /4, layer2 /8,
layer3 /16, layer4 /32], U-Net decoder with nearest-2x upsampling,
skip concatenation, and double conv3x3-BN-ReLU blocks with channels
(256, 128, 64, 32, 16), then a conv3x3 segmentation head.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from .norm import BatchNorm as _EfficientBatchNorm

# ResNet stage definitions: name -> (blocks per stage, bottleneck?)
_RESNET_CFG = {
    "resnet18": ((2, 2, 2, 2), False),
    "resnet34": ((3, 4, 6, 3), False),
    "resnet50": ((3, 4, 6, 3), True),
}

_conv_init = nn.initializers.he_normal()


class _BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda: _EfficientBatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype)
        residual = x
        # explicit (1,1) padding: for the stride-2 blocks XLA "SAME" would
        # pad (0,1) where torch ResNet pads (1,1) — the symmetric form is
        # required for torch-checkpoint import parity (torch_import.py);
        # identical to SAME at stride 1
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                    kernel_init=_conv_init)(x)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, kernel_init=_conv_init)(y)
        y = norm()(y)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               kernel_init=_conv_init)(residual)
            residual = norm()(residual)
        return nn.relu(y + residual)


class _Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda: _EfficientBatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype)
        out_ch = self.features * 4
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=_conv_init)(x)
        y = nn.relu(norm()(y))
        y = nn.Conv(self.features, (3, 3),
                    strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)],   # torch parity, see _BasicBlock
                    use_bias=False, dtype=self.dtype,
                    kernel_init=_conv_init)(y)
        y = nn.relu(norm()(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=_conv_init)(y)
        y = norm()(y)
        if residual.shape[-1] != out_ch or self.stride != 1:
            residual = nn.Conv(out_ch, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               kernel_init=_conv_init)(residual)
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    """ResNet-18/34/50 feature extractor returning pyramid features.

    Returns [x (identity), f1 (/2), f2 (/4), f3 (/8), f4 (/16), f5 (/32)],
    the skip layout smp's UnetDecoder consumes.
    """
    name_: str = "resnet34"
    dtype: jnp.dtype = jnp.float32
    # Rematerialize each residual block in the backward pass (jax.checkpoint
    # via nn.remat): the b8 train step is HBM-traffic-bound, not FLOP-bound
    # (trace: ~7 ms elementwise fusions vs 1.5 ms convs of 11.1 ms), so
    # trading saved-activation reads for recompute is a throughput lever,
    # not just a memory one. Off by default pending on-chip measurement.
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        blocks, bottleneck = _RESNET_CFG[self.name_]
        naive_cls = _Bottleneck if bottleneck else _BasicBlock
        # explicit names keep remat-wrapped blocks at the naive module paths
        # (remat would otherwise prefix "Checkpoint_" and break checkpoints)
        block_cls = (nn.remat(naive_cls, static_argnums=(2,)) if self.remat
                     else naive_cls)
        blk_idx = {"i": 0}

        def block(width, stride):
            m = block_cls(width, stride=stride, dtype=self.dtype,
                          name=f"{naive_cls.__name__}_{blk_idx['i']}")
            blk_idx["i"] += 1
            return m

        feats = [x]

        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype,
                    kernel_init=_conv_init)(x)
        y = _EfficientBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(y)
        y = nn.relu(y)
        feats.append(y)                                    # /2

        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, (n_blocks, width) in enumerate(zip(blocks, (64, 128, 256, 512))):
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                y = block(width, stride)(y, train)
            feats.append(y)                                # /4 /8 /16 /32
        return feats


class _ConvKernel(nn.Module):
    """Parameter-compatible stand-in for nn.Conv: owns the (kh, kw, Cin,
    Cout) kernel (and optionally the bias) but leaves the lowering to the
    caller. Named "Conv_i" at the call site so the fused decoder's
    parameter tree (and checkpoints) match the naive nn.Conv path
    exactly."""
    features: int
    in_features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        k = self.param("kernel", _conv_init,
                       (3, 3, self.in_features, self.features),
                       jnp.float32)
        if not self.use_bias:
            return k
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class _DecoderBlock(nn.Module):
    """U-Net decoder block: nearest-up 2x, skip concat, double conv-BN-ReLU.

    ``fused=True`` (default) lowers the upsample+conv through the
    phase-embedded kernel (models/phaseconv.py): one 3x3 SAME conv at the
    LOW resolution producing the four output phases as channel groups,
    then depth_to_space — the 4x nearest-upsampled tensor is never
    materialized. Exactly equal to the naive path in f32 (pinned in
    tests); parameter trees are identical between the two paths, so
    checkpoints interchange.
    """
    features: int
    dtype: jnp.dtype = jnp.float32
    fused: bool = True
    # phase_out=True (only valid when skip is None, i.e. the LAST block):
    # return the block output STILL in phase-major space-to-depth form
    # (B, L, L', 4C) — the caller applies the segmentation head with a
    # dense-embedded phase kernel and performs the single depth_to_space
    # on the (tiny) logits instead of materializing (B, 2L, 2L', C).
    phase_out: bool = False

    @nn.compact
    def __call__(self, x, skip, train: bool):
        aligned = skip is None or (2 * x.shape[1] == skip.shape[1]
                                   and 2 * x.shape[2] == skip.shape[2])
        if self.fused and aligned:
            return self._fused(x, skip, train)
        y = self._naive(x, skip, train)
        if self.phase_out:
            from .phaseconv import space_to_depth
            y = space_to_depth(y)
        return y

    def _naive(self, x, skip, train: bool):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest 2x
        if skip is not None:
            # crop if odd-size mismatch (inputs padded to /32 avoid this)
            if x.shape[1] != skip.shape[1] or x.shape[2] != skip.shape[2]:
                x = x[:, :skip.shape[1], :skip.shape[2], :]
            x = jnp.concatenate([x, skip], axis=-1)
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, kernel_init=_conv_init)(x)
            x = _EfficientBatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
            x = nn.relu(x)
        return x

    # Blocks whose channel count is at most this run FULLY phase-internal
    # (skip conv as a strided 4x4 phase-emitting conv, conv2 dense-embedded,
    # BN/ReLU in phase space, ONE depth_to_space at the block output).
    # Wider blocks already fill the MXU's 128 lanes, and the dense
    # lowering's 4x FLOPs lose there — they keep the hybrid lowering
    # (phase up-conv only). 32 is the measured crossover
    # (scripts/measure_phase_threshold.py: the 64-feature block flipped
    # from phase to hybrid gains +4% b256 inference, train unchanged —
    # consistent with micro_cascade_conv.py's 72-channel loss).
    _PHASE_INTERNAL_MAX_CH = 32

    def _fused(self, x, skip, train: bool):
        """Phase-space lowering of the decoder block (models/phaseconv.py).

        conv1 = conv3x3(concat(up2(x), skip)) splits by linearity into
          * the up-part: ONE 3x3 SAME conv at x's (low) resolution with the
            phase-embedded kernel (4x output channel groups) — same FLOPs
            as the high-res conv, MXU-shaped operands, and the 4x
            nearest-upsampled tensor is never materialized (measured
            6.3 ms -> 1.4 ms per 32-batch at the 320^2 block on the v5e);
          * the skip-part: for low-channel blocks (<= 64 features), a
            strided 4x4 conv emitting phase-major output directly
            (16/9 the FLOPs, no space-to-depth copy); for wide blocks a
            plain high-res 3x3 conv after depth_to_space.
        Low-channel blocks then keep BN/ReLU/conv2 in phase space (conv2
        dense-embedded: 4x FLOPs paid for 4x the channels on the MXU
        lanes) and depth_to_space once at the block boundary; wide blocks
        run them at high resolution.
        """
        from .phaseconv import (apply_strided_phase, dense_embedded_kernel,
                                depth_to_space, strided_phase_kernel,
                                upconv_embedded_kernel)
        phase = (self.features <= self._PHASE_INTERNAL_MAX_CH
                 or (self.phase_out and skip is None))
        cx = x.shape[-1]
        cs = 0 if skip is None else skip.shape[-1]
        # Kernels are cast to compute dtype BEFORE the phase embedding: the
        # embeddings are pads/permutations (+ two exact-in-f32 tap sums for
        # the up-conv), so assembling in bf16 halves the per-step kernel-
        # construction traffic the b8 trace showed inside the epoch scan
        # (f32 copies/slices of the 512-768 channel decoder kernels).
        k1 = _ConvKernel(self.features, cx + cs, name="Conv_0")()
        k1 = k1.astype(self.dtype)
        w_up = upconv_embedded_kernel(k1[:, :, :cx])
        y = lax.conv_general_dilated(
            x.astype(self.dtype), w_up, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if not phase:
            y = depth_to_space(y)
        if skip is not None:
            k_sk = k1[:, :, cx:]
            if phase:
                y = y + apply_strided_phase(
                    skip.astype(self.dtype), strided_phase_kernel(k_sk))
            else:
                y = y + lax.conv_general_dilated(
                    skip.astype(self.dtype), k_sk, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
        g = 4 if phase else 1
        y = _EfficientBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         phase_groups=g, name="BatchNorm_0")(y)
        y = nn.relu(y)
        k2 = _ConvKernel(self.features, self.features, name="Conv_1")()
        k2 = k2.astype(self.dtype)
        k2 = dense_embedded_kernel(k2) if phase else k2
        y = lax.conv_general_dilated(
            y.astype(self.dtype), k2, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = _EfficientBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         phase_groups=g, name="BatchNorm_1")(y)
        y = nn.relu(y)
        if phase and not self.phase_out:
            y = depth_to_space(y)
        return y


class ResNetEncoderUNet(nn.Module):
    """smp.Unet-equivalent: ResNet encoder + U-Net decoder + conv3x3 head.

    Input/Output NHWC; logits returned in float32 regardless of compute
    dtype (loss math stays full precision).
    """
    encoder: str = "resnet34"
    classes: int = 1
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: jnp.dtype = jnp.float32
    fused_decoder: bool = True
    # per-block backward rematerialization (see ResNetEncoder.remat)
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        feats = ResNetEncoder(self.encoder, dtype=self.dtype,
                              remat=self.remat)(x, train)
        # skips (deepest first, excluding the bottleneck f5): f4,f3,f2,f1,None
        skips = [feats[4], feats[3], feats[2], feats[1], None]
        y = feats[5]
        # The LAST block, when it has no skip (the standard 5-deep decoder),
        # stays in phase-major space-to-depth form so the segmentation head
        # — a pathologically shaped high-res conv with `classes` (usually
        # 1) output channels — runs as a dense-embedded phase conv at half
        # resolution with 4x the channels; only the (tiny) logits get
        # depth_to_space'd. With a shortened decoder (fewer channels than
        # skips) the last block still consumes a skip and returns high-res,
        # so the head falls back to the plain conv.
        n_blocks = min(len(self.decoder_channels), len(skips))
        phase_tail = self.fused_decoder and skips[n_blocks - 1] is None
        dec_cls = (nn.remat(_DecoderBlock, static_argnums=(3,)) if self.remat
                   else _DecoderBlock)
        for i, (ch, skip) in enumerate(zip(self.decoder_channels, skips)):
            y = dec_cls(ch, dtype=self.dtype, fused=self.fused_decoder,
                        phase_out=(phase_tail and skip is None),
                        name=f"_DecoderBlock_{i}")(y, skip, train)
        if phase_tail:
            from .phaseconv import dense_embedded_kernel, depth_to_space
            kh, bh = _ConvKernel(self.classes, self.decoder_channels[-1],
                                 use_bias=True, name="Conv_0")()
            logits = lax.conv_general_dilated(
                y.astype(self.dtype),
                dense_embedded_kernel(kh.astype(self.dtype)), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            logits = logits + jnp.tile(bh, 4).astype(self.dtype)
            logits = depth_to_space(logits)
        else:
            logits = nn.Conv(self.classes, (3, 3), padding="SAME",
                             dtype=self.dtype, kernel_init=_conv_init)(y)
        return logits.astype(jnp.float32)


class UNetPlusPlus(nn.Module):
    """smp.UnetPlusPlus-equivalent: nested dense skip decoder over the same
    ResNet encoder (Zhou et al. 2018). X[i][j] nodes; output from X[0][4].

    ``fused_decoder=True`` (default) applies the phase-space lowerings of
    models/phaseconv.py where they compose with the nested grid: every
    node's up2+conv runs as ONE phase-embedded conv at the deep input's
    resolution (the 4x upsampled tensor is never materialized; the priors'
    part of the same kernel stays a high-res conv), and the final
    full-resolution segment (up + double conv at 16 ch + `classes`-channel
    head) runs ENTIRELY in phase space with one depth_to_space on the
    logits — the same tail lowering as ResNetEncoderUNet. Parameter trees
    are identical between the fused and naive paths (explicit Conv_i /
    BatchNorm_i names reproduce flax's auto-numbering), so checkpoints
    interchange; f32 equality is pinned in tests.
    """
    encoder: str = "resnet34"
    classes: int = 1
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: jnp.dtype = jnp.float32
    fused_decoder: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .phaseconv import (dense_embedded_kernel, depth_to_space,
                                upconv_embedded_kernel)
        x = x.astype(self.dtype)
        feats = ResNetEncoder(self.encoder, dtype=self.dtype)(x, train)
        # Encoder levels for the nested grid, shallow->deep: /2 /4 /8 /16 /32
        enc = [feats[1], feats[2], feats[3], feats[4], feats[5]]
        depth = len(enc) - 1  # 4 nested columns
        # channels per decoder row (same schedule as the plain decoder,
        # deepest row first in decoder_channels order)
        row_ch = list(self.decoder_channels)[:depth][::-1]  # shallow->deep
        fused = self.fused_decoder
        idx = {"c": 0, "b": 0}

        def bn(y, g=1):
            m = _EfficientBatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype, phase_groups=g,
                                    name=f"BatchNorm_{idx['b']}")
            idx["b"] += 1
            return m(y)

        def conv_hr(y, ch, use_bias=False):
            m = nn.Conv(ch, (3, 3), padding="SAME", use_bias=use_bias,
                        dtype=self.dtype, kernel_init=_conv_init,
                        name=f"Conv_{idx['c']}")
            idx["c"] += 1
            return m(y)

        def kern(ch, cin, use_bias=False):
            k = _ConvKernel(ch, cin, use_bias=use_bias,
                            name=f"Conv_{idx['c']}")()
            idx["c"] += 1
            return k

        def conv(w, t):
            return lax.conv_general_dilated(
                t.astype(self.dtype), w.astype(self.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def up2(t):
            return jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)

        def node_conv1(priors, deep, ch):
            """conv3x3 over concat(priors..., up2(deep)): the deep (up)
            part phase-embedded at low resolution when fused."""
            if not fused:
                return conv_hr(jnp.concatenate(priors + [up2(deep)], -1), ch)
            cp = sum(p.shape[-1] for p in priors)
            k1 = kern(ch, cp + deep.shape[-1])
            y = depth_to_space(conv(upconv_embedded_kernel(k1[:, :, cp:]),
                                    deep))
            return y + conv(k1[:, :, :cp], jnp.concatenate(priors, -1))

        grid = {(i, 0): enc[i] for i in range(depth + 1)}
        for j in range(1, depth + 1):
            for i in range(depth + 1 - j):
                priors = [grid[(i, k)] for k in range(j)]
                y = node_conv1(priors, grid[(i + 1, j - 1)], row_ch[i])
                y = nn.relu(bn(y))
                y = nn.relu(bn(conv_hr(y, row_ch[i])))
                grid[(i, j)] = y

        # final segment sits at /2; one more decoder step up to full res +
        # the segmentation head — fully phase-space when fused (the same
        # tail lowering as ResNetEncoderUNet's last block).
        ch_tail = self.decoder_channels[-1]
        src = grid[(0, depth)]
        if fused:
            y = conv(upconv_embedded_kernel(kern(ch_tail, src.shape[-1])),
                     src)                                 # phase-major
            y = nn.relu(bn(y, g=4))
            y = conv(dense_embedded_kernel(kern(ch_tail, ch_tail)), y)
            y = nn.relu(bn(y, g=4))
            kh, bh = kern(self.classes, ch_tail, use_bias=True)
            logits = conv(dense_embedded_kernel(kh), y)
            logits = logits + jnp.tile(bh, 4).astype(self.dtype)
            logits = depth_to_space(logits)
        else:
            y = up2(src)
            y = nn.relu(bn(conv_hr(y, ch_tail)))
            y = nn.relu(bn(conv_hr(y, ch_tail)))
            logits = conv_hr(y, self.classes, use_bias=True)
        return logits.astype(jnp.float32)
