"""Shared NumPy/SciPy oracle implementations of the reference's pipeline.

These transcribe the reference algorithms (with skimage semantics where the
reference used skimage) so tests can pin the framework without skimage/smp
installed. Sources cited per function.
"""
import numpy as np
import torch
import torch.nn.functional as F
from scipy import ndimage as ndi


def np_disk(radius):
    yy, xx = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    return (yy ** 2 + xx ** 2 <= radius ** 2)


def np_otsu(image, nbins=256):
    """skimage.filters.threshold_otsu, transcribed."""
    counts, bin_edges = np.histogram(image.ravel(), bins=nbins,
                                     range=(image.min(), image.max()))
    counts = counts.astype(float)
    bin_centers = (bin_edges[:-1] + bin_edges[1:]) / 2.0
    weight1 = np.cumsum(counts)
    weight2 = np.cumsum(counts[::-1])[::-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        mean1 = np.cumsum(counts * bin_centers) / weight1
        mean2 = (np.cumsum((counts * bin_centers)[::-1]) /
                 np.cumsum(counts[::-1]))[::-1]
    variance12 = weight1[:-1] * weight2[1:] * (mean1[:-1] - mean2[1:]) ** 2
    idx = np.nanargmax(variance12)
    return bin_centers[idx]


def np_erosion(m, se):
    return ndi.binary_erosion(m, structure=se, border_value=1)


def np_dilation(m, se):
    return ndi.binary_dilation(m, structure=se, border_value=0)


def np_remove_small(m, min_size=256):
    lbl, n = ndi.label(m, structure=np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]]))
    out = m.copy()
    for i in range(1, n + 1):
        comp = lbl == i
        if comp.sum() < min_size:
            out[comp] = False
    return out


def np_body_mask(img):
    """Reference _body_mask (mri_preprocess.py:195-214), skimage semantics."""
    v = img - img.min()
    vmax = v.max()
    if vmax <= 0:
        return np.zeros_like(img, dtype=np.uint8)
    v = v / vmax
    if np.all(v == v.flat[0]):
        th = float(v.mean())
    else:
        th = np_otsu(v)
    if not np.isfinite(th):
        th = 0.5
    m = (v > th)
    if m.sum() == 0:
        return m.astype(np.uint8)
    se = np_disk(2)
    m = np_dilation(np_erosion(m, se), se)
    m = np_erosion(np_dilation(m, se), se)
    m = np_remove_small(m.astype(bool), 256)
    return m.astype(np.uint8)


def np_resize(img, out_hw):
    """Reference _resize_np (torch bilinear align_corners=False)."""
    t = torch.from_numpy(img)[None, None].float()
    t = F.interpolate(t, size=out_hw, mode="bilinear", align_corners=False)
    return t[0, 0].numpy().astype(np.float32)


def np_zscore_in_mask(img, mask):
    vals = img[mask > 0]
    if vals.size < 10:
        mean, std = img.mean(), img.std()
    else:
        mean, std = vals.mean(), vals.std()
    std = std if std > 1e-6 else 1.0
    return ((img - mean) / std).astype(np.float32)


def np_preview01(img, mask):
    vals = img[mask > 0]
    if vals.size > 0:
        lo, hi = float(vals.min()), float(vals.max())
    else:
        lo, hi = float(img.min()), float(img.max())
    return ((img - lo) / (hi - lo + 1e-6)).astype(np.float32)


def np_ifft2c_mag(ksp):
    x = np.fft.ifftshift(ksp, axes=(-2, -1))
    x = np.fft.ifft2(x, norm="ortho")
    x = np.fft.fftshift(x, axes=(-2, -1))
    return np.abs(x).astype(np.float32)


def np_preprocess_slice(ksp, out_size=(320, 320), clip=(1.0, 99.5)):
    """Full reference per-slice chain (mri_preprocess.py:44-92), k-space in."""
    img = np_ifft2c_mag(ksp)
    lo, hi = np.percentile(img, clip[0]), np.percentile(img, clip[1])
    img = np.clip(img, lo, hi)
    mk = np_body_mask(img)
    img_r = np_resize(img, out_size)
    mk_r = (np_resize(mk.astype(np.float32), out_size) > 0.5).astype(np.uint8)
    img_z = np_zscore_in_mask(img_r, mk_r)
    img_01 = np_preview01(img_r, mk_r)
    return img_z, img_01, mk_r


def synthetic_knee(rng, h=128, w=128):
    """Bright blob on dark noisy background, like a magnitude MRI slice."""
    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    cy, cx = h / 2 + rng.uniform(-8, 8), w / 2 + rng.uniform(-8, 8)
    r = min(h, w) * rng.uniform(0.25, 0.35)
    blob = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * r * r))).astype(np.float32)
    noise = rng.random((h, w)).astype(np.float32) * 0.05
    speck = (rng.random((h, w)) > 0.995).astype(np.float32) * 0.9
    return blob + noise + speck


def synthetic_kspace_volume(rng, s=8, h=64, w=48):
    """(S,H,W) complex64 k-space of synthetic knee slices (+ its images)."""
    imgs = np.stack([synthetic_knee(rng, h, w) for _ in range(s)])
    ksp = np.fft.fftshift(
        np.fft.fft2(np.fft.ifftshift(imgs, axes=(-2, -1)), norm="ortho"),
        axes=(-2, -1)).astype(np.complex64)
    return ksp, imgs


def write_fake_fastmri_h5(path, ksp, target=None):
    import h5py
    with h5py.File(path, "w") as hf:
        hf.create_dataset("kspace", data=ksp)
        if target is not None:
            hf.create_dataset("reconstruction_esc", data=target)
