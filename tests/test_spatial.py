"""Halo-exchange depth-sharded 3-D convolution (parallel/spatial.py) vs
the single-device oracle, on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from mri_acl_imagesegmentation_adsp_tpu.parallel.mesh import make_mesh
from mri_acl_imagesegmentation_adsp_tpu.parallel.spatial import (
    conv3d_depth_sharded, conv3d_stack_depth_sharded)


def _oracle_same(x, k):
    return lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def test_conv3d_depth_sharded_matches_unsharded():
    rng = np.random.default_rng(0)
    mesh = make_mesh(8)
    x = jnp.asarray(rng.standard_normal((2, 16, 6, 5, 4)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 4, 7)).astype(np.float32))
    got = np.asarray(conv3d_depth_sharded(x, k, mesh))
    want = np.asarray(_oracle_same(x, k))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_conv3d_depth_sharded_kernel_depth_one_needs_no_halo():
    rng = np.random.default_rng(1)
    mesh = make_mesh(8)
    x = jnp.asarray(rng.standard_normal((1, 8, 4, 4, 3)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 3, 3, 3, 5)).astype(np.float32))
    got = np.asarray(conv3d_depth_sharded(x, k, mesh))
    np.testing.assert_allclose(got, np.asarray(_oracle_same(x, k)),
                               rtol=1e-5, atol=1e-5)


def test_conv3d_stack_depth_sharded_matches_unsharded():
    """Per-layer halo exchange through a conv+ReLU stack: the band never
    leaves its chip, 2 halo planes/shard/layer move over the mesh."""
    rng = np.random.default_rng(2)
    mesh = make_mesh(8)
    x = jnp.asarray(rng.standard_normal((1, 24, 5, 6, 2)).astype(np.float32))
    ks = [jnp.asarray(rng.standard_normal(s).astype(np.float32)) * 0.2
          for s in ((3, 3, 3, 2, 6), (3, 1, 1, 6, 6), (3, 3, 3, 6, 4))]
    got = np.asarray(conv3d_stack_depth_sharded(x, ks, mesh))
    want = x
    for i, k in enumerate(ks):
        want = _oracle_same(want, k)
        if i + 1 < len(ks):
            want = jnp.maximum(want, 0)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-5)


def test_conv3d_depth_sharded_validates_band():
    import pytest
    mesh = make_mesh(8)
    x = jnp.zeros((1, 12, 4, 4, 1))     # 12 % 8 != 0
    k = jnp.zeros((3, 3, 3, 1, 1))
    with pytest.raises(ValueError):
        conv3d_depth_sharded(x, k, mesh)
