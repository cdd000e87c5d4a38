"""Cartesian reconstruction paths.

Fills the reference's empty src/recon/cartesian.py stub (SURVEY.md C24)
with the recon capabilities its north star targets:
  - single-coil centered-iFFT magnitude (mri_preprocess.py:149-160)
  - multi-coil iFFT + RSS coil combination (vendored
    DL_reconstruction/coil_combine.py:12-41 + fastmri_prostate
    reconstruction/utils.py ifftnd/center_crop_im/flip_im)

All device math is real-pair (..., 2); complex ndarrays are accepted at the
host boundary.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from ..ops import ifft2c_pair, rss_complex
from ..ops.cpair import to_pair


def recon_singlecoil(kspace) -> np.ndarray:
    """(..., H, W) complex or (..., H, W, 2) pair -> magnitude float32."""
    from ..ops import ifft2c_magnitude
    if not isinstance(kspace, jnp.ndarray) and np.iscomplexobj(kspace):
        kspace = to_pair(kspace)
    return np.asarray(ifft2c_magnitude(jnp.asarray(kspace)))


def recon_multicoil_rss(kspace_coils, coil_axis: int = 0) -> np.ndarray:
    """Multi-coil k-space -> RSS magnitude image.

    kspace_coils: (..., C, H, W) complex (host) or (..., C, H, W, 2) pair.
    The centered orthonormal iFFT runs per coil, then RSS over the coil
    axis — one fused device computation.
    """
    k = kspace_coils
    if not isinstance(k, jnp.ndarray) and np.iscomplexobj(k):
        k = to_pair(k)
    k = jnp.asarray(k)
    img = ifft2c_pair(k)
    return np.asarray(rss_complex(img, axis=coil_axis))


def ifftnd_scaled(kspace_pair: jnp.ndarray, axes: Sequence[int]
                  ) -> jnp.ndarray:
    """Vendored ``ifftnd`` semantics on pairs: centered inverse FFT over
    ``axes`` scaled by sqrt(prod(shape[axes])) ON TOP of the backward norm
    — equivalent to the orthonormal transform (utils.py:7-30), which is
    exactly what ifft2c_pair computes for 2 axes."""
    axes = tuple(axes)
    if tuple(sorted(a % (kspace_pair.ndim - 1) for a in axes)) != (
            kspace_pair.ndim - 3, kspace_pair.ndim - 2):
        raise NotImplementedError(
            "ifftnd_scaled supports the last two (spatial) axes; "
            f"got {axes}")
    return ifft2c_pair(kspace_pair)


def center_crop_im(im_3d: np.ndarray, crop_to_size: Tuple[int, int]
                   ) -> np.ndarray:
    """Vendored center_crop_im (utils.py:56-77), including its int()
    truncation behavior for odd differences."""
    x_crop = im_3d.shape[-1] / 2 - crop_to_size[0] / 2
    y_crop = im_3d.shape[-2] / 2 - crop_to_size[1] / 2
    return im_3d[..., int(y_crop):int(crop_to_size[1] + y_crop),
                 int(x_crop):int(crop_to_size[0] + x_crop)]


def flip_im(vol: np.ndarray, slice_axis: int = 0) -> np.ndarray:
    """Vendored flip_im: flipud each slice along slice_axis (utils.py:33-53)."""
    out = np.array(vol)
    for i in range(out.shape[slice_axis]):
        sl = [slice(None)] * out.ndim
        sl[slice_axis] = i
        out[tuple(sl)] = np.flipud(out[tuple(sl)])
    return out
