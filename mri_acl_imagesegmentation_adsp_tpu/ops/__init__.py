"""Pure numeric kernels (jnp + Pallas).

Every function here is a pure, jit-compatible function of its array inputs
with static-shape control flow, so it can live inside ``jax.jit`` /
``shard_map`` regions and fuse with surrounding compute.
"""

from .fftc import (
    fft2c,
    ifft2c,
    fft2c_pair,
    ifft2c_pair,
    fft2c_parts,
    ifft2c_parts,
    pair_abs,
    to_pair,
    ifft2c_magnitude,
    complex_abs,
    rss,
    rss_complex,
    center_crop_or_pad,
)
from .imageops import (
    percentile,
    percentile_clip,
    resize_bilinear,
    zscore_in_mask,
    preview_01,
)
from .maskops import (
    otsu_threshold,
    binary_erosion,
    binary_dilation,
    binary_opening,
    binary_closing,
    disk,
    label_components,
    remove_small_objects,
    body_mask,
)
from .edt import edt, surface_distances, hd95, assd

__all__ = [
    "fft2c", "ifft2c", "fft2c_pair", "ifft2c_pair", "fft2c_parts",
    "ifft2c_parts", "pair_abs", "to_pair",
    "ifft2c_magnitude", "complex_abs", "rss", "rss_complex",
    "center_crop_or_pad",
    "percentile", "percentile_clip", "resize_bilinear", "zscore_in_mask",
    "preview_01",
    "otsu_threshold", "binary_erosion", "binary_dilation", "binary_opening",
    "binary_closing", "disk", "label_components", "remove_small_objects",
    "body_mask",
    "edt", "surface_distances", "hd95", "assd",
]
