"""Tests for VarNet, SSIM loss, and recon evaluation metrics."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from mri_acl_imagesegmentation_adsp_tpu.recon import (
    VarNet, NormUnet, SensitivityModel, sens_reduce, sens_expand,
)
from mri_acl_imagesegmentation_adsp_tpu.train.ssim import ssim_loss
from mri_acl_imagesegmentation_adsp_tpu.metrics import (
    mse, nmse, psnr, ssim, Metrics,
)
from mri_acl_imagesegmentation_adsp_tpu.ops.cpair import cmul, cconj


def _pair(rng, shape):
    return jnp.asarray(rng.standard_normal((*shape, 2)).astype(np.float32))


def test_normunet_preserves_shape_and_unnormalizes(rng):
    m = NormUnet(chans=4, num_pools=2)
    x = _pair(rng, (2, 1, 1, 24, 20))  # (b, c, a, h, w, 2): odd sizes pad to 16s
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_sensitivity_model_rss_normalized(rng):
    m = SensitivityModel(chans=4, num_pools=2)
    esp = _pair(rng, (1, 4, 1, 16, 16))
    v = m.init(jax.random.PRNGKey(0), esp)
    sens = np.asarray(m.apply(v, esp))
    # RSS over coils must be ~1 everywhere (divide_root_sum_of_squares)
    rss = np.sqrt((sens[..., 0] ** 2 + sens[..., 1] ** 2).sum(axis=1))
    np.testing.assert_allclose(rss, 1.0, rtol=1e-4, atol=1e-4)


def test_sens_reduce_expand_adjointness(rng):
    """sens_reduce(sens_expand(x)) == x when sens maps have unit RSS."""
    b, c, a, h, w = 1, 3, 1, 16, 16
    raw = np.asarray(_pair(rng, (b, c, a, h, w)))
    rss = np.sqrt((raw[..., 0] ** 2 + raw[..., 1] ** 2).sum(1, keepdims=True))
    sens = jnp.asarray(raw / np.expand_dims(rss, -1))  # unit-RSS maps
    x = _pair(rng, (b, a, h, w))
    back = sens_reduce(sens_expand(x, sens), sens)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_varnet_forward_shapes_and_grad(rng):
    model = VarNet(bvalue="b50", num_cascades=2, sens_chans=4, sens_pools=2,
                   chans=4, pools=2)
    ksp = _pair(rng, (1, 3, 3, 16, 16))     # (b, coils, aves, h, w, 2)
    esp = _pair(rng, (1, 3, 3, 16, 16))
    v = model.init(jax.random.PRNGKey(0), ksp, esp)
    out = model.apply(v, ksp, esp)
    assert out.shape == (1, 3, 16, 16)
    assert np.isfinite(np.asarray(out)).all()

    def loss(params):
        return jnp.mean(model.apply(params, ksp, esp) ** 2)

    g = jax.grad(loss)(v)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert total > 0
    # dc_weight parameters exist (one per cascade)
    flat = jax.tree_util.tree_flatten_with_path(v)[0]
    dc = [p for p, _ in flat if any("dc_weight" in str(k) for k in p)]
    assert len(dc) == 2


def _torch_ssim_loss(x, y, dr, win=7, k1=0.01, k2=0.03):
    """Vendored SSIMLoss.forward, verbatim."""
    X, Y = torch.from_numpy(x), torch.from_numpy(y)
    data_range = torch.from_numpy(dr)[:, None, None, None]
    w = torch.ones(1, 1, win, win) / win ** 2
    NP = win ** 2
    cov_norm = NP / (NP - 1)
    C1 = (k1 * data_range) ** 2
    C2 = (k2 * data_range) ** 2
    ux, uy = F.conv2d(X, w), F.conv2d(Y, w)
    uxx, uyy, uxy = F.conv2d(X * X, w), F.conv2d(Y * Y, w), F.conv2d(X * Y, w)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    A1, A2 = 2 * ux * uy + C1, 2 * vxy + C2
    B1, B2 = ux ** 2 + uy ** 2 + C1, vx + vy + C2
    S = (A1 * A2) / (B1 * B2)
    return float(1 - S.mean())


def test_ssim_loss_matches_vendored_torch(rng):
    x = np.abs(rng.standard_normal((2, 1, 24, 24))).astype(np.float32)
    y = (x + 0.1 * rng.standard_normal((2, 1, 24, 24))).astype(np.float32)
    dr = np.asarray([x[0].max(), x[1].max()], np.float32)
    got = float(ssim_loss(jnp.asarray(x), jnp.asarray(y), jnp.asarray(dr)))
    assert abs(got - _torch_ssim_loss(x, y, dr)) < 1e-5


def test_recon_eval_metrics(rng):
    gt = np.abs(rng.standard_normal((3, 32, 32))).astype(np.float64)
    pred = gt + 0.05 * rng.standard_normal((3, 32, 32))
    assert abs(mse(gt, pred) - np.mean((gt - pred) ** 2)) < 1e-12
    assert abs(nmse(gt, pred) - np.linalg.norm(gt - pred) ** 2
               / np.linalg.norm(gt) ** 2) < 1e-12
    expect_psnr = 10 * np.log10(gt.max() ** 2 / np.mean((gt - pred) ** 2))
    assert abs(psnr(gt, pred) - expect_psnr) < 1e-9

    s = ssim(gt, pred)
    assert 0.3 < s < 1.0
    assert ssim(gt, gt) > 0.999

    m = Metrics()
    m.push(gt, pred)
    m.push(gt, gt)
    means = m.means()
    assert set(means) == {"MSE", "NMSE", "PSNR", "SSIM"}
    assert "SSIM" in repr(m)
