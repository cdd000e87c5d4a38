"""Torch ResNet checkpoint -> Flax encoder parameter import.

Capability target: reference src/models/unet_factory.py:12-30 accepts any
smp encoder name plus ``encoder_weights="imagenet"`` — smp then loads the
torchvision/timm-pretrained ResNet state_dict into the encoder. No weight
zoo is downloadable in this environment, but torch IS installed, so this
module provides the equivalent surface: a host-side converter mapping a
torchvision-layout (or smp ``encoder.``-prefixed) ResNet ``state_dict`` to
the ``models/unet2d.py:ResNetEncoder`` parameter tree, and the 2-D factory
/ trainer accept ``encoder_weights=<path.pt>`` to initialize the encoder
from such a checkpoint.

Layout contract (torchvision resnet18/34/50):
  conv1.weight                 -> ResNetEncoder_0/Conv_0.kernel
  bn1.{weight,bias}            -> ResNetEncoder_0/BatchNorm_0.{scale,bias}
  bn1.running_{mean,var}       -> batch_stats .../BatchNorm_0.{mean,var}
  layer{s}.{b}.conv{i}/bn{i}   -> _BasicBlock_{g}/Conv_{i-1},BatchNorm_{i-1}
                                  (_Bottleneck_{g} for resnet50)
  layer{s}.{b}.downsample.0/.1 -> the block's LAST Conv_i/BatchNorm_i
where ``g`` is the block index counted ACROSS stages (the unet2d naming).

Conv kernels transpose (O, I, kh, kw) -> (kh, kw, I, O). When the Flax
stem expects fewer input channels than the checkpoint provides (a 1-channel
MRI model from a 3-channel ImageNet checkpoint), the stem kernel is SUMMED
over the input-channel axis — exactly equivalent to feeding the
gray->3-channel replicated input the reference's ``imagenet_norm`` path
constructs (conv(replicate(x), W) == conv(x, W.sum(in_axis))), and the
same adaptation smp's ``patch_first_conv`` applies.

All work is host-side numpy on the unpacked state_dict; nothing here
touches the device.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

from .unet2d import _RESNET_CFG

__all__ = [
    "load_torch_checkpoint",
    "convert_resnet_encoder",
    "apply_encoder_weights",
]


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint file into a flat {name: ndarray} dict.

    Accepts a bare ``state_dict``, or the common wrappers
    ``{"state_dict": ...}`` / ``{"model": ...}``; strips ``module.``
    (DataParallel) and ``encoder.`` (smp Unet) key prefixes so both a raw
    torchvision ResNet and an smp segmentation checkpoint's encoder load.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    for key in ("state_dict", "model", "model_state"):
        if isinstance(obj, dict) and key in obj and isinstance(
                obj[key], dict):
            obj = obj[key]
            break
    out: Dict[str, np.ndarray] = {}
    for name, value in obj.items():
        if not hasattr(value, "detach"):
            continue
        for prefix in ("module.", "encoder."):
            if name.startswith(prefix):
                name = name[len(prefix):]
        out[name] = value.detach().cpu().numpy()
    return out


def _kernel(sd: Mapping[str, np.ndarray], name: str) -> np.ndarray:
    """(O, I, kh, kw) torch conv weight -> (kh, kw, I, O) Flax kernel."""
    w = np.asarray(sd[name], np.float32)
    return np.transpose(w, (2, 3, 1, 0))


def _bn(sd: Mapping[str, np.ndarray], name: str
        ) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """torch BN buffers -> (params {scale,bias}, batch_stats {mean,var})."""
    return (
        {"scale": np.asarray(sd[f"{name}.weight"], np.float32),
         "bias": np.asarray(sd[f"{name}.bias"], np.float32)},
        {"mean": np.asarray(sd[f"{name}.running_mean"], np.float32),
         "var": np.asarray(sd[f"{name}.running_var"], np.float32)},
    )


def convert_resnet_encoder(
    sd: Mapping[str, np.ndarray],
    encoder: str,
    stem_in_ch: int | None = None,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Build the ``ResNetEncoder`` (params, batch_stats) subtrees from a
    torchvision-layout state_dict.

    ``stem_in_ch``: expected input channels of the target model's stem;
    if smaller than the checkpoint's, the stem kernel is summed over the
    input-channel axis (see module docstring). None keeps the checkpoint's.
    """
    if encoder not in _RESNET_CFG:
        raise ValueError(
            f"unsupported encoder {encoder!r}; torch import supports "
            f"{sorted(_RESNET_CFG)}")
    blocks, bottleneck = _RESNET_CFG[encoder]
    block_name = "_Bottleneck" if bottleneck else "_BasicBlock"
    missing = [k for k in ("conv1.weight", "bn1.weight")
               if k not in sd]
    if missing:
        raise ValueError(
            f"checkpoint lacks torchvision ResNet keys {missing}; got e.g. "
            f"{sorted(sd)[:5]}")

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    stem = _kernel(sd, "conv1.weight")
    if stem_in_ch is not None and stem.shape[2] != stem_in_ch:
        if stem_in_ch < stem.shape[2]:
            stem = stem.sum(axis=2, keepdims=True)
            if stem_in_ch > 1:
                stem = np.repeat(stem / stem_in_ch, stem_in_ch, axis=2)
        else:
            raise ValueError(
                f"cannot widen a {stem.shape[2]}-channel checkpoint stem "
                f"to {stem_in_ch} input channels")
    params["Conv_0"] = {"kernel": stem}
    bn_p, bn_s = _bn(sd, "bn1")
    params["BatchNorm_0"] = bn_p
    stats["BatchNorm_0"] = bn_s

    g = 0
    for stage, n_blocks in enumerate(blocks, start=1):
        for b in range(n_blocks):
            pfx = f"layer{stage}.{b}"
            node = f"{block_name}_{g}"
            g += 1
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            n_convs = 3 if bottleneck else 2
            for i in range(n_convs):
                bp[f"Conv_{i}"] = {
                    "kernel": _kernel(sd, f"{pfx}.conv{i + 1}.weight")}
                p, s = _bn(sd, f"{pfx}.bn{i + 1}")
                bp[f"BatchNorm_{i}"] = p
                bs[f"BatchNorm_{i}"] = s
            if f"{pfx}.downsample.0.weight" in sd:
                bp[f"Conv_{n_convs}"] = {
                    "kernel": _kernel(sd, f"{pfx}.downsample.0.weight")}
                p, s = _bn(sd, f"{pfx}.downsample.1")
                bp[f"BatchNorm_{n_convs}"] = p
                bs[f"BatchNorm_{n_convs}"] = s
            params[node] = bp
            stats[node] = bs
    return params, stats


def _tree_align(template: Any, new: Any, path: str = "") -> Any:
    """Recursively replace ``template`` leaves with ``new``'s, checking the
    structures and shapes agree (clear error naming the mismatching path)."""
    import jax.numpy as jnp

    if isinstance(template, Mapping):
        if not isinstance(new, Mapping) or set(template) != set(new):
            got = sorted(new) if isinstance(new, Mapping) else type(new)
            raise ValueError(
                f"encoder import structure mismatch at {path or '/'}: "
                f"model has {sorted(template)}, checkpoint maps to {got}")
        return type(template)(
            {k: _tree_align(template[k], new[k], f"{path}/{k}")
             for k in template})
    tmpl_shape = tuple(np.shape(template))
    if tuple(np.shape(new)) != tmpl_shape:
        raise ValueError(
            f"encoder import shape mismatch at {path}: model "
            f"{tmpl_shape}, checkpoint {np.shape(new)}")
    return jnp.asarray(new, dtype=template.dtype)


def apply_encoder_weights(state, path: str, encoder: str):
    """Return ``state`` (an engine.TrainState) with the U-Net's encoder
    subtree re-initialized from the torch checkpoint at ``path``.

    Non-encoder parameters (decoder, head) and the optimizer state keep
    their fresh initialization — the smp ``encoder_weights="imagenet"``
    semantics (only the encoder is pretrained).
    """
    sd = load_torch_checkpoint(path)
    enc_key = "ResNetEncoder_0"
    if enc_key not in state.params:
        raise ValueError(
            f"model has no {enc_key} subtree (keys: "
            f"{sorted(state.params)}); torch import targets the "
            "ResNet-encoder U-Net family")
    stem_in = int(np.shape(
        state.params[enc_key]["Conv_0"]["kernel"])[2])
    new_p, new_s = convert_resnet_encoder(sd, encoder, stem_in_ch=stem_in)
    params = dict(state.params)
    params[enc_key] = _tree_align(state.params[enc_key], new_p,
                                  f"params/{enc_key}")
    batch_stats = dict(state.batch_stats)
    batch_stats[enc_key] = _tree_align(state.batch_stats[enc_key], new_s,
                                       f"batch_stats/{enc_key}")
    return state._replace(params=params, batch_stats=batch_stats)
