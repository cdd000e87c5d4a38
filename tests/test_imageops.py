"""Golden tests for ops.imageops vs numpy/torch oracles
(reference src/preprocess/mri_preprocess.py:183-233)."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from mri_acl_imagesegmentation_adsp_tpu.ops import (
    percentile_clip, resize_bilinear, zscore_in_mask, preview_01,
)


def test_percentile_clip_matches_numpy(rng):
    img = (rng.standard_normal((96, 80)) ** 2).astype(np.float32)
    lo, hi = np.percentile(img, 1.0), np.percentile(img, 99.5)
    expect = np.clip(img, lo, hi)
    got = np.asarray(percentile_clip(jnp.asarray(img), 1.0, 99.5))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def _torch_resize(img, out_hw):
    t = torch.from_numpy(img)[None, None].float()
    t = F.interpolate(t, size=out_hw, mode="bilinear", align_corners=False)
    return t[0, 0].numpy().astype(np.float32)


def test_resize_bilinear_matches_torch(rng):
    """Oracle = reference _resize_np (torch F.interpolate align_corners=False)."""
    cases = [((64, 48), (32, 32)),   # downscale
             ((40, 40), (80, 96)),   # upscale
             ((37, 53), (320, 320)), # odd -> standard
             ((640, 368), (320, 320)),  # real fastMRI knee shape
             ((64, 64), (64, 64))]   # identity
    for in_hw, out_hw in cases:
        img = rng.standard_normal(in_hw).astype(np.float32)
        expect = _torch_resize(img, out_hw)
        got = np.asarray(resize_bilinear(jnp.asarray(img), out_hw))
        np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-4,
                                   err_msg=f"{in_hw}->{out_hw}")


def test_resize_bilinear_batched(rng):
    vol = rng.standard_normal((5, 40, 56)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(vol), (32, 32)))
    for s in range(5):
        np.testing.assert_allclose(got[s], _torch_resize(vol[s], (32, 32)),
                                   rtol=1e-4, atol=1e-5)


def _np_zscore_in_mask(img, mask):
    vals = img[mask > 0]
    if vals.size < 10:
        mean, std = img.mean(), img.std()
    else:
        mean, std = vals.mean(), vals.std()
    std = std if std > 1e-6 else 1.0
    return ((img - mean) / std).astype(np.float32)


def test_zscore_in_mask_matches_reference(rng):
    img = rng.standard_normal((64, 64)).astype(np.float32) * 3 + 7
    mask = (rng.random((64, 64)) > 0.5).astype(np.uint8)
    got = np.asarray(zscore_in_mask(jnp.asarray(img), jnp.asarray(mask)))
    np.testing.assert_allclose(got, _np_zscore_in_mask(img, mask), rtol=1e-4, atol=1e-4)


def test_zscore_in_mask_small_mask_fallback(rng):
    img = rng.standard_normal((32, 32)).astype(np.float32)
    mask = np.zeros((32, 32), np.uint8)
    mask[0, :5] = 1  # < 10 px -> whole-image stats
    got = np.asarray(zscore_in_mask(jnp.asarray(img), jnp.asarray(mask)))
    np.testing.assert_allclose(got, _np_zscore_in_mask(img, mask), rtol=1e-4, atol=1e-4)


def test_zscore_constant_image_uses_unit_std():
    img = np.full((32, 32), 5.0, np.float32)
    mask = np.ones((32, 32), np.uint8)
    got = np.asarray(zscore_in_mask(jnp.asarray(img), jnp.asarray(mask)))
    np.testing.assert_allclose(got, np.zeros_like(img), atol=1e-6)


def _np_preview01(img, mask):
    vals = img[mask > 0]
    if vals.size > 0:
        lo, hi = float(vals.min()), float(vals.max())
    else:
        lo, hi = float(img.min()), float(img.max())
    return ((img - lo) / (hi - lo + 1e-6)).astype(np.float32)


def test_preview01_matches_reference(rng):
    img = rng.standard_normal((48, 48)).astype(np.float32)
    mask = (rng.random((48, 48)) > 0.3).astype(np.uint8)
    got = np.asarray(preview_01(jnp.asarray(img), jnp.asarray(mask)))
    np.testing.assert_allclose(got, _np_preview01(img, mask), rtol=1e-4, atol=1e-5)

    empty = np.zeros((48, 48), np.uint8)
    got = np.asarray(preview_01(jnp.asarray(img), jnp.asarray(empty)))
    np.testing.assert_allclose(got, _np_preview01(img, empty), rtol=1e-4, atol=1e-5)


def test_resize_matches_frozen_torch_goldens():
    """Frozen torch F.interpolate outputs (tests/goldens, see
    make_goldens.py) guard against oracle/env drift."""
    import pathlib
    z = np.load(pathlib.Path(__file__).parent / "goldens"
                / "preprocess_goldens.npz")
    for i in range(8):
        got = np.asarray(resize_bilinear(jnp.asarray(z[f"img_{i}"]),
                                         (96, 80)))
        np.testing.assert_allclose(got, z[f"resize_{i}"],
                                   rtol=1e-3, atol=1e-4)
