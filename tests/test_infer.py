"""Tests for volume inference + report metrics facade."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from mri_acl_imagesegmentation_adsp_tpu.infer import (
    segment_volume_2d, sliding_window_3d, evaluate_volume,
)
from mri_acl_imagesegmentation_adsp_tpu.metrics import (
    dice_bin, iou_bin, hd95, assd,
)

pytestmark = pytest.mark.slow


def test_segment_volume_2d_shapes_and_25d(rng):
    vol = rng.standard_normal((7, 1, 32, 32)).astype(np.float32)

    calls = []

    def apply_fn(x):
        # x.shape is static under tracing (apply_fn runs inside the scan jit)
        calls.append(tuple(x.shape))
        return jnp.sum(x, axis=-1, keepdims=True) * 0.0 + x[..., :1]

    probs = segment_volume_2d(apply_fn, vol, k=3, batch_size=4)
    assert probs.shape == (7, 1, 32, 32)
    assert all(s[-1] == 3 for s in calls), "2.5-D stack must be channelized"
    assert (probs >= 0).all() and (probs <= 1).all()


def test_segment_volume_edge_clamping(rng):
    """First slice's 2.5-D stack must clamp to slice 0 (datasets.py:94)."""
    vol = np.arange(5, dtype=np.float32)[:, None, None] * np.ones((5, 4, 4),
                                                                  np.float32)

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    # the d=-1 neighbor channel as logits: slice s sees vol[max(s-1, 0)]
    probs = segment_volume_2d(lambda x: x[..., :1], vol[:, None], k=3,
                              batch_size=8)
    expect = sig(np.maximum(np.arange(5) - 1, 0).astype(np.float32))
    assert np.allclose(probs[:, 0, 0, 0], expect, atol=1e-6)

    # the d=+1 neighbor channel: slice s sees vol[min(s+1, 4)]
    probs = segment_volume_2d(lambda x: x[..., -1:], vol[:, None], k=3,
                              batch_size=8)
    expect = sig(np.minimum(np.arange(5) + 1, 4).astype(np.float32))
    assert np.allclose(probs[:, 0, 0, 0], expect, atol=1e-6)


def test_segment_volume_2d_mesh_matches_unsharded(rng):
    """Data-parallel inference: per-step batch sharded over the full mesh
    == the single-device run (a real U-Net, so conv/BN inference paths are
    exercised; params replicated through the closure)."""
    from mri_acl_imagesegmentation_adsp_tpu.models import build_unet
    from mri_acl_imagesegmentation_adsp_tpu.parallel import make_mesh

    vol = rng.standard_normal((11, 1, 32, 32)).astype(np.float32)
    model = build_unet("unet", "resnet18", "none", in_ch=3, classes=1)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3), jnp.float32),
                           train=False)

    def apply_fn(x):
        return model.apply(variables, x, train=False)

    want = segment_volume_2d(apply_fn, vol, k=3, batch_size=4)
    got = segment_volume_2d(apply_fn, vol, k=3, batch_size=4,
                            mesh=make_mesh(8))
    # batch rounds 4 -> 8 on the mesh; results must agree slice-for-slice
    assert got.shape == want.shape == (11, 1, 32, 32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sliding_window_3d_blending_constant_logits(rng):
    """Identity-logit model -> uniform probability everywhere despite
    overlapping windows (blend normalization must cancel)."""
    vol = rng.standard_normal((20, 24, 24)).astype(np.float32)

    def apply_fn(x):
        return jnp.full(x.shape, 1.7)  # constant logits

    probs = sliding_window_3d(apply_fn, vol, roi=(8, 12, 12), overlap=0.5,
                              blend="gaussian")
    assert probs.shape == (1, 20, 24, 24)
    expect = 1.0 / (1.0 + np.exp(-1.7))
    np.testing.assert_allclose(probs, expect, rtol=1e-4, atol=1e-4)


def test_sliding_window_3d_covers_whole_volume(rng):
    vol = rng.standard_normal((10, 30, 17)).astype(np.float32)

    def apply_fn(x):
        return x  # echo: logits = input values

    probs = sliding_window_3d(apply_fn, vol, roi=(4, 16, 16), overlap=0.25)
    assert np.isfinite(probs).all()
    # sign of vol must drive probs (>0.5 where vol>0) in window interiors
    inner = (slice(0, 1), slice(2, 8), slice(4, 12), slice(4, 12))
    agree = ((probs[inner] > 0.5) == (vol[None][inner] > 0)).mean()
    assert agree > 0.95


def test_evaluate_volume_matches_facade(rng):
    yy, xx = np.mgrid[:32, :32]
    a = ((yy - 16) ** 2 + (xx - 16) ** 2 <= 64).astype(np.uint8)
    b = np.roll(a, 2, axis=0)
    out = evaluate_volume(a, b)
    assert abs(out["dice"] - dice_bin(a, b)) < 1e-6
    assert abs(out["iou"] - iou_bin(a, b)) < 1e-6
    assert abs(out["hd95"] - hd95(a, b)) < 1e-5
    assert abs(out["assd"] - assd(a, b)) < 1e-5


def test_metrics_facade_vs_scipy_reference(rng):
    from scipy.ndimage import distance_transform_edt as np_edt
    a = rng.random((40, 40)) > 0.6
    b = rng.random((40, 40)) > 0.6
    d = np.concatenate([np_edt(~b)[a], np_edt(~a)[b]])
    assert abs(hd95(a, b) - np.percentile(d, 95)) < 1e-3
    assert abs(assd(a, b) - d.mean()) < 1e-3
    inter = (a & b).sum()
    e_dice = (2 * inter + 1e-7) / (a.sum() + b.sum() + 1e-7)
    assert abs(dice_bin(a.astype(np.uint8), b.astype(np.uint8)) - e_dice) < 1e-6


def test_tta_hflip_is_exact_mean_probability(rng):
    """tta='hflip' must equal the hand-computed mean of sigmoid(model(x))
    and flipped-back sigmoid(model(flip(x))) — the logit(mean-prob)
    re-encoding is exact, not an approximation."""
    vol = rng.standard_normal((5, 1, 16, 16)).astype(np.float32)
    w = jnp.asarray(rng.standard_normal((16,)).astype(np.float32))

    def apply_fn(x):   # asymmetric in W so the flip matters
        return (x[..., :1] * w[None, None, :, None]
                + 0.3 * x[..., :1] ** 2)

    plain = segment_volume_2d(apply_fn, vol, k=1, batch_size=2)
    tta = segment_volume_2d(apply_fn, vol, k=1, batch_size=2, tta="hflip")
    assert not np.allclose(tta, plain), "flip must change an asymmetric model"

    def sig(v):
        return 1.0 / (1.0 + np.exp(-np.asarray(v, np.float64)))

    x = jnp.asarray(vol[:, 0])[..., None]     # (S,H,W,1)
    p1 = sig(apply_fn(x))
    p2 = sig(apply_fn(x[:, :, ::-1, :])[:, :, ::-1, :])
    want = np.moveaxis(0.5 * (p1 + p2), -1, 1)
    np.testing.assert_allclose(tta, want, atol=1e-5)


def test_tta_hflip_multiclass_softmax_mean(rng):
    vol = rng.standard_normal((3, 1, 8, 8)).astype(np.float32)
    w = jnp.asarray(rng.standard_normal((8, 3)).astype(np.float32))

    def apply_fn(x):
        return x[..., :1] * w[None, None, :, :]   # (B,H,W,3), W-asymmetric

    tta = segment_volume_2d(apply_fn, vol, k=1, batch_size=2, classes=3,
                            tta="hflip")

    def soft(v):
        v = np.asarray(v, np.float64)
        e = np.exp(v - v.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    x = jnp.asarray(vol[:, 0])[..., None]
    p1 = soft(apply_fn(x))
    p2 = soft(apply_fn(x[:, :, ::-1, :])[:, :, ::-1, :])
    want = np.moveaxis(0.5 * (p1 + p2), -1, 1)
    np.testing.assert_allclose(tta, want, atol=1e-5)
    np.testing.assert_allclose(tta.sum(axis=1), 1.0, atol=1e-5)


def test_tta_symmetric_model_matches_plain(rng):
    """A W-symmetric model makes hflip TTA a no-op (sanity invariance)."""
    vol = rng.standard_normal((4, 1, 12, 12)).astype(np.float32)

    def apply_fn(x):
        return x[..., :1] ** 2     # even in the input; flip-equivariant

    plain = segment_volume_2d(apply_fn, vol, k=1, batch_size=2)
    tta = segment_volume_2d(apply_fn, vol, k=1, batch_size=2, tta="hflip")
    np.testing.assert_allclose(tta, plain, atol=1e-5)
