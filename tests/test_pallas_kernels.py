"""Pallas kernel tests (interpret mode on CPU; same code path as TPU)."""
import numpy as np
import jax.numpy as jnp

from mri_acl_imagesegmentation_adsp_tpu.ops import (
    binary_opening, binary_closing, disk,
)
from mri_acl_imagesegmentation_adsp_tpu.ops.pallas import fused_open_close


def test_fused_open_close_matches_conv_path(rng):
    for shape in [(64, 64), (96, 80)]:
        m = rng.random(shape) > 0.55
        expect = np.asarray(binary_closing(
            binary_opening(jnp.asarray(m), disk(2)), disk(2)))
        got = np.asarray(fused_open_close(jnp.asarray(m)))
        np.testing.assert_array_equal(got, expect)


def test_fused_open_close_border_semantics():
    # full mask survives (erosion border pads True)
    m = np.ones((32, 32), bool)
    assert np.asarray(fused_open_close(jnp.asarray(m))).all()
    # empty stays empty
    z = np.zeros((32, 32), bool)
    assert not np.asarray(fused_open_close(jnp.asarray(z))).any()
    # single pixel is removed by opening
    p = np.zeros((32, 32), bool)
    p[16, 16] = True
    assert not np.asarray(fused_open_close(jnp.asarray(p))).any()
