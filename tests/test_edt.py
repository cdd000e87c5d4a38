"""Golden tests for ops.edt vs scipy oracle (reference src/metrics/medimetrics.py)."""
import numpy as np
import jax.numpy as jnp
from scipy.ndimage import distance_transform_edt as np_edt

from mri_acl_imagesegmentation_adsp_tpu.ops import edt, hd95, assd


def _ref_surface_distances(a, b, spacing=None):
    """Reference medimetrics._surface_distances, transcribed verbatim."""
    a = a.astype(bool); b = b.astype(bool)
    if spacing is None:
        spacing = (1.0, 1.0)
    a_border = a ^ np.logical_and(np_edt(~a) > 0, a)
    b_border = b ^ np.logical_and(np_edt(~b) > 0, b)
    if not a_border.any():
        a_border = a
    if not b_border.any():
        b_border = b
    dt = np_edt(~b, sampling=spacing)
    d_ab = dt[a_border]
    dt2 = np_edt(~a, sampling=spacing)
    d_ba = dt2[b_border]
    return np.concatenate([d_ab, d_ba])


def _ref_hd95(pred, gt, spacing=None):
    d = _ref_surface_distances(pred, gt, spacing)
    return 0.0 if d.size == 0 else float(np.percentile(d, 95))


def _ref_assd(pred, gt, spacing=None):
    d = _ref_surface_distances(pred, gt, spacing)
    return 0.0 if d.size == 0 else float(d.mean())


def _blob(rng, h=64, w=64, r=14, jitter=0):
    yy, xx = np.mgrid[:h, :w]
    cy, cx = h // 2 + jitter, w // 2 - jitter
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r)


def test_edt_matches_scipy(rng):
    for p in [0.3, 0.6, 0.9]:
        m = rng.random((48, 56)) > p
        got = np.asarray(edt(jnp.asarray(m)))
        expect = np_edt(m)
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_edt_all_zero_input():
    m = np.zeros((16, 16))
    np.testing.assert_array_equal(np.asarray(edt(jnp.asarray(m))), np.zeros((16, 16)))


def test_hd95_matches_reference(rng):
    a = _blob(rng, jitter=0)
    b = _blob(rng, jitter=3)
    got = float(hd95(jnp.asarray(a), jnp.asarray(b)))
    expect = _ref_hd95(a, b)
    assert abs(got - expect) < 1e-3, (got, expect)


def test_assd_matches_reference(rng):
    a = _blob(rng, jitter=0)
    b = _blob(rng, jitter=4)
    got = float(assd(jnp.asarray(a), jnp.asarray(b)))
    expect = _ref_assd(a, b)
    assert abs(got - expect) < 1e-3, (got, expect)


def test_hd95_assd_with_spacing(rng):
    a = _blob(rng, jitter=0)
    b = _blob(rng, jitter=2)
    sp = (0.7, 1.3)
    assert abs(float(hd95(jnp.asarray(a), jnp.asarray(b), sp)) - _ref_hd95(a, b, sp)) < 1e-3
    assert abs(float(assd(jnp.asarray(a), jnp.asarray(b), sp)) - _ref_assd(a, b, sp)) < 1e-3


def test_identical_masks_zero_distance(rng):
    a = _blob(rng)
    assert float(hd95(jnp.asarray(a), jnp.asarray(a))) == 0.0
    assert float(assd(jnp.asarray(a), jnp.asarray(a))) == 0.0


def test_edt_matches_frozen_scipy_goldens():
    """Frozen scipy.ndimage.distance_transform_edt outputs on the golden
    body masks (tests/goldens, see make_goldens.py)."""
    import pathlib
    z = np.load(pathlib.Path(__file__).parent / "goldens"
                / "preprocess_goldens.npz")
    for i in range(8):
        m = z[f"mask_{i}"].astype(bool)
        got = np.asarray(edt(jnp.asarray(~m)))
        np.testing.assert_allclose(got, z[f"edt_{i}"], rtol=1e-4, atol=1e-3)
