"""Post-training int8 quantization for 2-D U-Net serving.

A serving capability beyond the reference (whose inference surface is an
empty stub — src/infer/segment.py, SURVEY.md C24): fold BatchNorm into the
convolutions, calibrate per-conv activation scales on a handful of batches,
quantize weights to per-output-channel symmetric int8, and run inference
with int8 x int8 -> int32 convolutions on the MXU (the v5e's int8 systolic
peak is 2x its bf16 peak; XLA fuses the dequant/bias/ReLU epilogues).

Scope: ``models.unet2d.ResNetEncoderUNet`` and ``UNetPlusPlus`` (all three
ResNet encoders).
Checkpoints from the fused (phase-space) trainer load directly — the fused
and naive parameter trees are identical by construction (models/unet2d.py);
quantized inference always evaluates the plain (naive) dataflow, which at
the batch-256 throughput sweet spot matches the fused path's speed in bf16
(ROADMAP: 60.3 vs 62.0 ms at b256) and is the natural home for int8.

Pipeline:
  fold    -> eval-mode BN is affine per channel: y = conv(x) * A + B with
             A = scale * rsqrt(var + eps), B = bias - mean * A. Fold A into
             the conv kernel's output channels and keep B as a bias.
  calibrate -> run the folded f32 network on calibration batches recording
             the absolute maximum of every conv INPUT (static per-tensor
             activation scales; weights get per-channel scales, the
             standard w8a8 recipe).
  quantize -> w_q = round(w / s_w) int8 with s_w = absmax_per_cout / 127;
             at apply time x_q = round(x / s_x) int8, the conv accumulates
             in int32, and the result dequantizes by s_x * s_w[c].

The quantized parameter set is a plain pytree (nested dicts of arrays), so
it jits, shards, and serializes like any other params.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..models.unet2d import _RESNET_CFG, ResNetEncoderUNet

_DN = ("NHWC", "HWIO", "NHWC")


def _fold_conv_bn(conv: Dict, bn_p: Dict, bn_s: Dict,
                  eps: float = 1e-5) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(kernel', bias') with eval-mode BatchNorm folded in.

    Matches models/norm.py eval math exactly: A = scale*rsqrt(var+eps),
    B = bias - mean*A; conv has no bias of its own in this family.
    """
    a = bn_p["scale"] * lax.rsqrt(bn_s["var"] + eps)
    b = bn_p["bias"] - bn_s["mean"] * a
    return conv["kernel"] * a, b


def _quantize_kernel(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8. w: (kh,kw,Cin,Cout)."""
    s = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
    s = jnp.maximum(s, 1e-12)
    wq = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return wq, s.astype(jnp.float32)


@dataclass(frozen=True)
class QuantConfig:
    """How to run the quantized forward.

    mode:
      "int8"   — int8 weights AND activations, int32 MXU accumulation.
      "folded" — BN-folded but full-precision convs (compute_dtype); used
                 to pin fold exactness and as a safe fallback on backends
                 without integer conv support.
    """
    mode: str = "int8"
    compute_dtype: Any = jnp.bfloat16


class QuantizedUNet2D:
    """BN-folded, int8-quantized evaluator for the 2-D segmentation family
    (ResNetEncoderUNet and UNetPlusPlus).

    Build with :meth:`from_model`; ``apply(qtree, x)`` is a pure jittable
    function of the quantized pytree and an NHWC batch, returning float32
    logits like the source model.
    """

    def __init__(self, encoder: str, classes: int,
                 decoder_channels: Sequence[int],
                 config: QuantConfig = QuantConfig(), arch: str = "unet"):
        if arch not in ("unet", "unetpp"):
            raise ValueError(f"unsupported arch {arch!r}")
        self.encoder = encoder
        self.classes = int(classes)
        self.decoder_channels = tuple(decoder_channels)
        self.config = config
        self.arch = arch

    # ------------------------------------------------------------------
    # Build
    # ------------------------------------------------------------------

    @classmethod
    def from_model(cls, model: ResNetEncoderUNet, variables: Dict,
                   calib_batches: Sequence[np.ndarray],
                   config: QuantConfig = QuantConfig()
                   ) -> Tuple["QuantizedUNet2D", Dict]:
        """Fold + calibrate + quantize. Returns (engine, qtree).

        calib_batches: a few representative NHWC input batches (the same
        preprocessed/z-scored tensors inference sees). Activation scales
        are the running absmax over all of them.
        """
        arch = "unetpp" if type(model).__name__ == "UNetPlusPlus" else "unet"
        eng = cls(model.encoder, model.classes, model.decoder_channels,
                  config, arch=arch)
        folded = eng._fold(variables["params"],
                           variables.get("batch_stats", {}))
        scales: Dict[str, float] = {}

        def calib_conv(path, x, w, b, stride, padding):
            amax = float(jnp.max(jnp.abs(x)))
            scales[path] = max(scales.get(path, 0.0), amax, 1e-12)
            y = lax.conv_general_dilated(
                x.astype(jnp.float32), w.astype(jnp.float32), stride,
                padding, dimension_numbers=_DN)
            return y if b is None else y + b

        for xb in calib_batches:
            eng._forward(folded, jnp.asarray(xb, jnp.float32), calib_conv)

        qtree: Dict[str, Dict] = {}
        for path, leaf in folded.items():
            wq, ws = _quantize_kernel(leaf["w"])
            qtree[path] = {
                "w_q": wq, "w_scale": ws,
                "x_scale": jnp.float32(scales[path] / 127.0),
                "bias": leaf["b"],
            }
        return eng, qtree

    def _fold(self, params: Dict, batch_stats: Dict) -> Dict[str, Dict]:
        """Flatten the model tree into {conv_path: {w, b}} with BN folded.

        Walks the structural invariant of models/unet2d.py: within every
        module scope, ``Conv_i`` feeds ``BatchNorm_i``; the only unpaired
        conv is the root segmentation head (which carries its own bias).
        """
        out: Dict[str, Dict] = {}

        def fold_scope(scope_p: Dict, scope_s: Dict, prefix: str):
            convs = sorted(k for k in scope_p if k.startswith("Conv_"))
            for name in convs:
                i = name.split("_")[1]
                bn = f"BatchNorm_{i}"
                if bn in scope_p:
                    w, b = _fold_conv_bn(scope_p[name], scope_p[bn],
                                         scope_s[bn])
                else:  # the head conv: own bias, no BN
                    w = scope_p[name]["kernel"]
                    b = scope_p[name].get("bias")
                out[f"{prefix}{name}"] = {"w": w, "b": b}

        enc_p = params["ResNetEncoder_0"]
        enc_s = batch_stats.get("ResNetEncoder_0", {})
        fold_scope(enc_p, enc_s, "enc/")
        for key in sorted(enc_p):
            if key.startswith(("_BasicBlock_", "_Bottleneck_")):
                fold_scope(enc_p[key], enc_s[key], f"enc/{key}/")
        for key in sorted(params):
            if key.startswith("_DecoderBlock_"):
                fold_scope(params[key], batch_stats[key], f"{key}/")
        fold_scope(params, batch_stats, "")  # root head Conv_0
        return out

    # ------------------------------------------------------------------
    # Forward (shared by calibration and quantized inference)
    # ------------------------------------------------------------------

    def _forward(self, tree: Dict, x: jnp.ndarray,
                 conv: Callable) -> jnp.ndarray:
        """The naive dataflow of the source model over a flat conv tree.

        ``conv(path, x, w_or_leaf, b, stride, padding)`` performs one
        convolution (+bias); everything else (ReLU, residual adds, pool,
        nearest-up, concat) runs here in the compute dtype. Mirrors
        models/unet2d.py ResNetEncoder + (_DecoderBlock._naive for "unet",
        the nested naive grid for "unetpp") exactly.
        """
        blocks, bottleneck = _RESNET_CFG[self.encoder]

        def cbr(prefix, i, y, stride=(1, 1), padding="SAME", relu=True):
            leaf = tree[f"{prefix}Conv_{i}"]
            y = conv(f"{prefix}Conv_{i}", y,
                     leaf["w"] if "w" in leaf else leaf, leaf.get("b"),
                     stride, padding)
            return jax.nn.relu(y) if relu else y

        feats = [x]
        y = cbr("enc/", 0, x, stride=(2, 2), padding=[(3, 3), (3, 3)])
        feats.append(y)                                          # /2
        y = nn_max_pool(y)
        bi = 0
        for stage, n_blocks in enumerate(blocks):
            for b in range(n_blocks):
                stride = (2, 2) if (stage > 0 and b == 0) else (1, 1)
                kind = "_Bottleneck_" if bottleneck else "_BasicBlock_"
                p = f"enc/{kind}{bi}/"
                residual = y
                # explicit (1,1) on the 3x3 block convs mirrors unet2d's
                # torch-faithful padding (XLA SAME would pad (0,1) at
                # stride 2); identical to SAME at stride 1
                p11 = [(1, 1), (1, 1)]
                if bottleneck:
                    y = cbr(p, 0, y)
                    y = cbr(p, 1, y, stride=stride, padding=p11)
                    y = cbr(p, 2, y, relu=False)
                    ds = 3
                else:
                    y = cbr(p, 0, y, stride=stride, padding=p11)
                    y = cbr(p, 1, y, relu=False)
                    ds = 2
                if f"{p}Conv_{ds}" in tree:
                    residual = cbr(p, ds, residual, stride=stride,
                                   relu=False)
                y = jax.nn.relu(y + residual)
                bi += 1
            feats.append(y)                                      # /4.../32
        if self.arch == "unetpp":
            return self._decode_unetpp(feats, cbr)
        skips = [feats[4], feats[3], feats[2], feats[1], None]
        y = feats[5]
        for d, skip in enumerate(skips[:len(self.decoder_channels)]):
            y = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
            if skip is not None:
                if (y.shape[1] != skip.shape[1]
                        or y.shape[2] != skip.shape[2]):
                    y = y[:, :skip.shape[1], :skip.shape[2], :]
                y = jnp.concatenate([y, skip], axis=-1)
            p = f"_DecoderBlock_{d}/"
            y = cbr(p, 0, y)
            y = cbr(p, 1, y)
        logits = cbr("", 0, y, relu=False)
        return logits.astype(jnp.float32)

    def _decode_unetpp(self, feats: List[jnp.ndarray],
                       cbr: Callable) -> jnp.ndarray:
        """Nested dense-skip decoder (UNetPlusPlus naive path): X[i][j]
        grid over encoder levels /2../32, then the full-resolution tail +
        head. Conv indices replay flax's auto-numbering order exactly."""
        up2 = lambda t: jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)
        enc = feats[1:6]
        depth = len(enc) - 1
        ci = 0
        grid = {(i, 0): enc[i] for i in range(depth + 1)}
        for j in range(1, depth + 1):
            for i in range(depth + 1 - j):
                priors = [grid[(i, k)] for k in range(j)]
                y = jnp.concatenate(priors + [up2(grid[(i + 1, j - 1)])], -1)
                y = cbr("", ci, y)
                ci += 1
                y = cbr("", ci, y)
                ci += 1
                grid[(i, j)] = y
        y = up2(grid[(0, depth)])
        y = cbr("", ci, y)
        y = cbr("", ci + 1, y)
        logits = cbr("", ci + 2, y, relu=False)
        return logits.astype(jnp.float32)

    # ------------------------------------------------------------------
    # Quantized apply
    # ------------------------------------------------------------------

    def apply(self, qtree: Dict, x: jnp.ndarray) -> jnp.ndarray:
        """Quantized (or folded-precision) inference. Jit me.

        Accepts an int8 qtree from ``quantize()`` in either config mode
        (mode="folded" dequantizes the int8 weights and runs f32 convs),
        or — in mode="folded" only — a raw folded tree from ``fold()``
        (full-precision weights, the ``apply_folded`` numerics)."""
        cdt = self.config.compute_dtype
        int8_mode = self.config.mode == "int8"

        def qconv(path, y, leaf, b, stride, padding):
            # leaf is a quant-leaf dict {w_q, w_scale, x_scale, bias} for
            # qtrees; for folded trees _forward's cbr already unpacked the
            # raw kernel into `leaf` and the folded bias into `b`
            is_qleaf = isinstance(leaf, dict)
            if int8_mode:
                if not is_qleaf:
                    raise TypeError(
                        f"int8 apply needs a quantized tree (leaf at "
                        f"{path!r} has no scales); run quantize() or use "
                        f"mode='folded'")
                yq = jnp.clip(jnp.round(y.astype(jnp.float32)
                                        / leaf["x_scale"]), -127, 127
                              ).astype(jnp.int8)
                acc = lax.conv_general_dilated(
                    yq, leaf["w_q"], stride, padding, dimension_numbers=_DN,
                    preferred_element_type=jnp.int32)
                out = (acc.astype(jnp.float32)
                       * (leaf["x_scale"] * leaf["w_scale"]))
                bias = leaf.get("bias")
            else:
                if is_qleaf:
                    w = leaf["w_q"].astype(jnp.float32) * leaf["w_scale"]
                    bias = leaf.get("bias")
                else:
                    w, bias = leaf, b
                out = lax.conv_general_dilated(
                    y.astype(cdt), w.astype(cdt), stride, padding,
                    dimension_numbers=_DN)
            if bias is not None:
                out = out + bias.astype(out.dtype)
            return out.astype(cdt)

        return self._forward(qtree, x.astype(cdt), qconv)

    def apply_folded(self, folded: Dict, x: jnp.ndarray) -> jnp.ndarray:
        """Full-precision forward over a folded (unquantized) tree — the
        fold-exactness oracle; also the "folded" fallback path."""
        cdt = self.config.compute_dtype

        def fconv(path, y, w, b, stride, padding):
            out = lax.conv_general_dilated(
                y.astype(cdt), w.astype(cdt), stride, padding,
                dimension_numbers=_DN)
            return out if b is None else out + b.astype(out.dtype)

        return self._forward(folded, x.astype(cdt), fconv)

    def fold(self, variables: Dict) -> Dict[str, Dict]:
        return self._fold(variables["params"],
                          variables.get("batch_stats", {}))


def save_qtree(path: str, qtree: Dict[str, Dict]) -> None:
    """Serialize a quantized parameter set to one .npz (the serving
    artifact: int8 kernels + f32 scales/biases, ~4x smaller than f32)."""
    flat = {}
    for cpath, leaf in qtree.items():
        for k, v in leaf.items():
            if v is not None:
                flat[f"{cpath}::{k}"] = np.asarray(v)
    np.savez_compressed(path, **flat)


def load_qtree(path: str) -> Dict[str, Dict]:
    out: Dict[str, Dict] = {}
    with np.load(path) as z:
        for key in z.files:
            cpath, k = key.rsplit("::", 1)
            out.setdefault(cpath, {})[k] = jnp.asarray(z[key])
    for leaf in out.values():
        leaf.setdefault("bias", None)
    return out


def nn_max_pool(y: jnp.ndarray) -> jnp.ndarray:
    """3x3/2 max pool with (1,1) padding — works for int8 and floats
    (max is order-preserving, so pooling commutes with quantization)."""
    pads = ((0, 0), (1, 1), (1, 1), (0, 0))
    init = (jnp.iinfo(y.dtype).min if jnp.issubdtype(y.dtype, jnp.integer)
            else -jnp.inf)
    return lax.reduce_window(y, init, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                             pads)
