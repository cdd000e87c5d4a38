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


from oracles import (
    np_disk, np_otsu, np_erosion, np_dilation, np_remove_small, np_body_mask,
    synthetic_knee as _synth,
)


def synthetic_knee(rng, h=128, w=128):
    return _synth(rng, h, w)


# ---------------- tests ----------------

def test_disk_matches_skimage_definition():
    for r in [1, 2, 3]:
        np.testing.assert_array_equal(disk(r).astype(bool), np_disk(r))


def test_otsu_matches_skimage_algorithm(rng):
    """Exact: the device histogram reproduces np.histogram's bin assignment
    (edge-corrected), so the selected bin center matches to f32/f64 eps."""
    for _ in range(5):
        img = synthetic_knee(rng)
        v = img - img.min()
        v = v / v.max()
        got = float(otsu_threshold(jnp.asarray(v)))
        expect = np_otsu(v)
        assert abs(got - expect) < 1e-6, (got, expect)


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
    """EXACT equality against the scipy-morphology oracle — the body mask
    is the Dice-critical target function, no mismatch budget."""
    for _ in range(4):
        img = synthetic_knee(rng)
        got = np.asarray(body_mask(jnp.asarray(img)))
        expect = np_body_mask(img)
        np.testing.assert_array_equal(got, expect)


def test_body_mask_matches_frozen_goldens():
    """Frozen fixtures (tests/goldens/preprocess_goldens.npz, generated with
    real scipy.ndimage morphology/labeling + the documented skimage Otsu
    algorithm) pin the mask function against both implementation AND oracle
    drift. Regenerate only with tests/make_goldens.py."""
    import pathlib
    z = np.load(pathlib.Path(__file__).parent / "goldens"
                / "preprocess_goldens.npz")
    for i in range(8):
        got = np.asarray(body_mask(jnp.asarray(z[f"img_{i}"])))
        np.testing.assert_array_equal(got, z[f"mask_{i}"])
        v = z[f"img_{i}"] - z[f"img_{i}"].min()
        v = v / v.max()
        th = float(otsu_threshold(jnp.asarray(v)))
        assert abs(th - float(z[f"otsu_{i}"])) < 1e-6


def test_body_mask_constant_image_is_empty():
    img = np.full((64, 64), 3.0, np.float32)
    got = np.asarray(body_mask(jnp.asarray(img)))
    assert got.sum() == 0
    assert got.dtype == np.uint8
