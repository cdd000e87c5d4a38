"""Masked-acquisition (mask_func) tests: fastMRI-style prospective
undersampling for the VarNet path (data/subsample.py)."""
import numpy as np
import pytest

from mri_acl_imagesegmentation_adsp_tpu.data.subsample import (
    RandomMaskFunc, EquispacedMaskFunc, apply_mask, seed_from_filename)


def test_random_mask_rate_and_center():
    mf = RandomMaskFunc(center_fractions=[0.08], accelerations=[4])
    w = 368
    rates = []
    for s in range(20):
        m = mf((16, 640, w, 2), seed=s)
        assert m.shape == (1, 1, w, 1)
        cols = m[0, 0, :, 0]
        num_low = round(w * 0.08)
        pad = (w - num_low + 1) // 2
        assert cols[pad:pad + num_low].all(), "center band fully sampled"
        rates.append(cols.mean())
    # expected keep rate = 1/accel on average
    assert abs(np.mean(rates) - 0.25) < 0.04, np.mean(rates)


def test_equispaced_mask_rate_and_center():
    mf = EquispacedMaskFunc(center_fractions=[0.04], accelerations=[8])
    w = 320
    m = mf((16, 640, w, 2), seed=0)[0, 0, :, 0]
    num_low = round(w * 0.04)
    pad = (w - num_low + 1) // 2
    assert m[pad:pad + num_low].all()
    assert abs(m.mean() - 1.0 / 8) < 0.05, m.mean()


def test_mask_deterministic_per_volume():
    mf = RandomMaskFunc([0.08], [4])
    seed = seed_from_filename("file_007.h5")
    m1 = mf((4, 64, 96, 2), seed=seed)
    m2 = mf((4, 64, 96, 2), seed=seed)
    np.testing.assert_array_equal(m1, m2)
    m3 = mf((4, 64, 96, 2), seed=seed_from_filename("file_008.h5"))
    assert not np.array_equal(m1, m3)


def test_apply_mask_zeroes_columns_real_pair(rng):
    k = rng.standard_normal((4, 32, 48, 2)).astype(np.float32)
    mf = RandomMaskFunc([0.1], [3])
    masked, mask = apply_mask(k, mf, seed=1)
    cols = mask[0, 0, :, 0].astype(bool)
    assert (masked[..., ~cols, :] == 0).all()
    np.testing.assert_array_equal(masked[..., cols, :], k[..., cols, :])


def test_transform_applies_mask_consistently_across_slices(rng):
    from mri_acl_imagesegmentation_adsp_tpu.data.transforms import (
        VarNetDataTransform)
    mf = RandomMaskFunc([0.1], [2])
    tr = VarNetDataTransform(mask_func=mf, use_seed=True)
    attrs = {"max": 1.0, "recon_size": (32, 32, 1)}
    ksp = rng.standard_normal((3, 32, 40)) + 1j * rng.standard_normal((3, 32, 40))
    esp = np.ones((3, 1, 32, 40), np.complex64)
    outs = [tr(ksp, np.abs(ksp[0]), esp, attrs, "vol_a.h5", s)
            for s in range(3)]
    pats = [np.any(np.abs(o.kspace), axis=(0, 1, 3)) for o in outs]
    np.testing.assert_array_equal(pats[0], pats[1])
    np.testing.assert_array_equal(pats[0], pats[2])
    assert pats[0].mean() < 0.9, "some columns must be masked away"
