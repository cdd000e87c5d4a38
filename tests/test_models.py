"""Shape/behavior tests for the Flax model zoo."""
import numpy as np
import jax
import jax.numpy as jnp

from mri_acl_imagesegmentation_adsp_tpu.models import (
    build_unet, build_unet3d, FastMRIUnet,
)


def _init_and_apply(model, x, train=False):
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    if train:
        out, _ = model.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    else:
        out = model.apply(variables, x, train=False)
    return out, variables


def test_unet_resnet34_shapes():
    model = build_unet("unet", "resnet34", "none", in_ch=1, classes=1)
    x = jnp.zeros((2, 64, 64, 1), jnp.float32)
    out, variables = _init_and_apply(model, x)
    assert out.shape == (2, 64, 64, 1)
    assert out.dtype == jnp.float32
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(variables["params"]))
    # smp Unet(resnet34, in=1, classes=1) is ~24.4M params; ours must be in
    # the same capacity class (same encoder/decoder widths).
    assert 20e6 < n_params < 30e6, n_params


def test_unet_multichannel_multiclass():
    model = build_unet("unet", "resnet18", "none", in_ch=3, classes=4)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    out, _ = _init_and_apply(model, x)
    assert out.shape == (1, 32, 32, 4)


def test_unet_train_mode_updates_batch_stats():
    model = build_unet("unet", "resnet18", "none", classes=1)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, 32, 32, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    out, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    changed = any(not np.allclose(b, a) for b, a in zip(before, after))
    assert changed, "batch stats must move in train mode"


def test_unetpp_shapes():
    model = build_unet("unetpp", "resnet18", "none", classes=1)
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    out, _ = _init_and_apply(model, x)
    assert out.shape == (1, 64, 64, 1)


def test_unet_rejects_pretrained_weights():
    import pytest
    with pytest.raises(ValueError):
        build_unet("unet", "resnet34", "imagenet")


def test_unet_bf16_compute_fp32_logits():
    model = build_unet("unet", "resnet18", "none", classes=1, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    out, _ = _init_and_apply(model, x)
    assert out.dtype == jnp.float32


def test_fastmri_unet_odd_shapes():
    model = FastMRIUnet(out_chans=1, chans=8, num_pool_layers=3)
    x = jnp.zeros((1, 37, 53, 1), jnp.float32)
    out, _ = _init_and_apply(model, x)
    assert out.shape == (1, 37, 53, 1)


def test_unet3d_shapes():
    model = build_unet3d(classes=1, channels=(8, 16, 32, 64, 80))
    x = jnp.zeros((1, 16, 32, 32, 1), jnp.float32)  # NDHWC
    out, _ = _init_and_apply(model, x)
    assert out.shape == (1, 16, 32, 32, 1)


def test_unet_gradients_flow():
    model = build_unet("unet", "resnet18", "none", classes=1)
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((1, 32, 32, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return jnp.mean(out ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert gnorm > 0
