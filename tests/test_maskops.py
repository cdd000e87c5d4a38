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


def test_fixed_sweeps_reach_fixpoint(rng):
    """body_mask's FIXED connected-component sweep count (the while_loop-free
    formulation the vmapped volume chain needs) must land on the exact
    fixpoint the dynamic while_loop reaches on the frozen goldens AND fresh
    synthetic slices, with the on-device convergence certificate True."""
    import pathlib
    import jax
    bm = jax.jit(body_mask, static_argnames=("cc_sweeps", "with_cc_flag"))
    z = np.load(pathlib.Path(__file__).parent / "goldens"
                / "preprocess_goldens.npz")
    imgs = [z[f"img_{i}"] for i in range(8)]
    imgs += [synthetic_knee(rng) for _ in range(4)]
    for img in imgs:
        exact = np.asarray(bm(jnp.asarray(img), cc_sweeps=None))
        fixed, ok = bm(jnp.asarray(img), with_cc_flag=True)  # default bound
        np.testing.assert_array_equal(np.asarray(fixed), exact)
        assert bool(np.asarray(ok)), "certificate must confirm convergence"


def test_cc_certificate_catches_adversarial_topology():
    """A spiral corridor needs many row/column turns — the fixed sweep
    count must REPORT non-convergence (certificate False) instead of
    silently returning a wrong partition, and the exact while_loop path
    must still label it as one component."""
    import jax
    from mri_acl_imagesegmentation_adsp_tpu.ops.maskops import (
        BODY_MASK_CC_SWEEPS)
    h = w = 65
    m = np.zeros((h, w), bool)
    # serpentine: horizontal bars joined alternately left/right — ONE
    # component whose min label needs ~#bars alternating row/col sweeps
    for r in range(0, h, 2):
        m[r, :] = True
    for i, r in enumerate(range(0, h - 2, 2)):
        m[r + 1, w - 1 if i % 2 == 0 else 0] = True
    lab = jax.jit(label_components, static_argnames=("sweeps", "check"))
    _, ok = lab(jnp.asarray(m), sweeps=BODY_MASK_CC_SWEEPS, check=True)
    assert not bool(np.asarray(ok)), "serpentine must be flagged unconverged"
    # exact path still produces one single component
    lbl = np.asarray(lab(jnp.asarray(m)))
    assert len(np.unique(lbl[m])) == 1


def test_otsu_adversarial_goldens():
    """Extreme-histogram fixtures (two-spike, bin-edge-exact, single
    outlier, crushed dynamic range — tests/make_goldens.py), frozen from the
    documented threshold_otsu algorithm in float64. Pins the device f32
    histogram's bin assignment where it is most fragile. skimage itself is
    not installable in this image; the residual risk is oracle-level, not
    implementation-level (see PARITY.md)."""
    import pathlib
    import jax
    otsu_j = jax.jit(otsu_threshold)
    bm = jax.jit(body_mask)
    z = np.load(pathlib.Path(__file__).parent / "goldens"
                / "otsu_adversarial.npz")
    names = sorted(k[len("otsu_"):] for k in z.files if k.startswith("otsu_"))
    assert len(names) == 8
    otsu_sorted = jax.jit(lambda im, s: otsu_threshold(im, sorted_values=s))
    for name in names:
        img = z[f"img_{name}"]
        got = float(otsu_j(jnp.asarray(img)))
        expect = float(z[f"otsu_{name}"])
        assert abs(got - expect) < 1e-6, (name, got, expect)
        # the searchsorted-histogram formulation (preprocess fast path)
        # must agree bin-exactly with the compare-reduce one
        got_s = float(otsu_sorted(jnp.asarray(img),
                                  jnp.sort(jnp.asarray(img).ravel())))
        assert abs(got_s - expect) < 1e-6, (name, got_s, expect)
        got_mask = np.asarray(bm(jnp.asarray(img)))
        np.testing.assert_array_equal(got_mask, z[f"mask_{name}"],
                                      err_msg=name)


def test_body_mask_constant_image_is_empty():
    # 128x128 reuses the already-jitted parity-test program (a bespoke
    # 64x64 shape cost this test its own 28 s body_mask compile)
    img = np.full((128, 128), 3.0, np.float32)
    got = np.asarray(body_mask(jnp.asarray(img)))
    assert got.sum() == 0
    assert got.dtype == np.uint8
