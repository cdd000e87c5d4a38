"""Golden tests for ops.maskops.

Oracles: scipy.ndimage (morphology with skimage border semantics, labeling)
and a NumPy transcription of skimage.filters.threshold_otsu's documented
algorithm (skimage itself is not installed in this image). Together they pin
the reference's Dice-critical body-mask function
(src/preprocess/mri_preprocess.py:195-214).
"""
import numpy as np
import jax.numpy as jnp
from scipy import ndimage as ndi

from mri_acl_imagesegmentation_adsp_tpu.ops import (
    otsu_threshold, binary_erosion, binary_dilation, binary_opening,
    binary_closing, disk, remove_small_objects, body_mask, label_components,
)


# ---------------- oracles ----------------

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
    # skimage binary_erosion: out-of-image treated as True
    return ndi.binary_erosion(m, structure=se, border_value=1)


def np_dilation(m, se):
    # skimage binary_dilation: out-of-image treated as False
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
    """Reference _body_mask with skimage-semantics oracles."""
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
    m = np_dilation(np_erosion(m, se), se)   # opening
    m = np_erosion(np_dilation(m, se), se)   # closing
    m = np_remove_small(m.astype(bool), 256)
    return m.astype(np.uint8)


def synthetic_knee(rng, h=128, w=128):
    """Bright blob on dark noisy background, like a magnitude MRI slice."""
    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    cy, cx = h / 2 + rng.uniform(-8, 8), w / 2 + rng.uniform(-8, 8)
    r = min(h, w) * rng.uniform(0.25, 0.35)
    blob = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * r * r))).astype(np.float32)
    noise = rng.random((h, w)).astype(np.float32) * 0.05
    speck = (rng.random((h, w)) > 0.995).astype(np.float32) * 0.9  # small bright specks
    return blob + noise + speck


# ---------------- tests ----------------

def test_disk_matches_skimage_definition():
    for r in [1, 2, 3]:
        np.testing.assert_array_equal(disk(r).astype(bool), np_disk(r))


def test_otsu_matches_skimage_algorithm(rng):
    for _ in range(5):
        img = synthetic_knee(rng)
        v = img - img.min()
        v = v / v.max()
        got = float(otsu_threshold(jnp.asarray(v)))
        expect = np_otsu(v)
        assert abs(got - expect) < 1.5 / 256, (got, expect)


def test_morphology_matches_scipy_with_skimage_borders(rng):
    m = rng.random((64, 64)) > 0.6
    se = disk(2)
    se_b = np_disk(2)
    np.testing.assert_array_equal(
        np.asarray(binary_erosion(jnp.asarray(m), se)), np_erosion(m, se_b))
    np.testing.assert_array_equal(
        np.asarray(binary_dilation(jnp.asarray(m), se)), np_dilation(m, se_b))
    np.testing.assert_array_equal(
        np.asarray(binary_opening(jnp.asarray(m), se)),
        np_dilation(np_erosion(m, se_b), se_b))
    np.testing.assert_array_equal(
        np.asarray(binary_closing(jnp.asarray(m), se)),
        np_erosion(np_dilation(m, se_b), se_b))


def test_morphology_border_semantics():
    # full-foreground mask must survive erosion (border pads with True)
    m = np.ones((16, 16), bool)
    got = np.asarray(binary_erosion(jnp.asarray(m), disk(2)))
    assert got.all()
    # dilation of empty stays empty
    z = np.zeros((16, 16), bool)
    assert not np.asarray(binary_dilation(jnp.asarray(z), disk(2))).any()


def test_label_components_partition_matches_scipy(rng):
    m = rng.random((48, 48)) > 0.55
    got = np.asarray(label_components(jnp.asarray(m)))
    ref, n = ndi.label(m, structure=np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]]))
    # same partition: bijection between label values on foreground
    for i in range(1, n + 1):
        vals = np.unique(got[ref == i])
        assert len(vals) == 1, f"component {i} split"
    # distinct scipy components map to distinct min-labels
    mins = [got[ref == i].flat[0] for i in range(1, n + 1)]
    assert len(set(mins)) == n
    # background is sentinel
    assert (got[~m] == m.size).all()


def test_remove_small_objects_matches_skimage_semantics(rng):
    m = rng.random((96, 96)) > 0.58
    got = np.asarray(remove_small_objects(jnp.asarray(m), min_size=20))
    expect = np_remove_small(m.copy(), min_size=20)
    np.testing.assert_array_equal(got, expect)


def test_body_mask_parity_on_synthetic_slices(rng):
    for _ in range(4):
        img = synthetic_knee(rng)
        got = np.asarray(body_mask(jnp.asarray(img)))
        expect = np_body_mask(img)
        # Otsu bin-center quantization can flip isolated threshold-straddling
        # pixels; require near-exact agreement.
        diff = (got != expect).mean()
        assert diff < 0.002, f"body mask mismatch fraction {diff}"


def test_body_mask_constant_image_is_empty():
    img = np.full((64, 64), 3.0, np.float32)
    got = np.asarray(body_mask(jnp.asarray(img)))
    assert got.sum() == 0
    assert got.dtype == np.uint8
