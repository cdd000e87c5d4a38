"""Direct unit tests for the real-pair complex primitives (ops/cpair)."""
import numpy as np
import jax.numpy as jnp

from mri_acl_imagesegmentation_adsp_tpu.ops.cpair import (
    cmul, cconj, cabs, cabs_sq, cmatmul, csolve, to_pair, to_pair_np,
    to_complex,
)


def _c(rng, shape):
    return (rng.standard_normal(shape)
            + 1j * rng.standard_normal(shape)).astype(np.complex64)


def test_elementwise_ops_match_numpy(rng):
    a = _c(rng, (8, 8))
    b = _c(rng, (8, 8))
    ap, bp = jnp.asarray(to_pair_np(a)), jnp.asarray(to_pair_np(b))
    np.testing.assert_allclose(to_complex(cmul(ap, bp)), a * b,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(to_complex(cconj(ap)), np.conj(a), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cabs(ap)), np.abs(a),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cabs_sq(ap)), np.abs(a) ** 2,
                               rtol=1e-5, atol=1e-5)


def test_cmatmul_matches_numpy(rng):
    a = _c(rng, (6, 5))
    b = _c(rng, (5, 7))
    got = to_complex(cmatmul(jnp.asarray(to_pair_np(a)),
                             jnp.asarray(to_pair_np(b))))
    np.testing.assert_allclose(got, a @ b, rtol=1e-4, atol=1e-4)


def test_csolve_matches_numpy(rng):
    a = _c(rng, (9, 9)) + 3 * np.eye(9)  # well-conditioned
    b = _c(rng, (9, 4))
    got = to_complex(csolve(jnp.asarray(to_pair_np(a)),
                            jnp.asarray(to_pair_np(b))))
    np.testing.assert_allclose(got, np.linalg.solve(a, b),
                               rtol=1e-3, atol=1e-3)


def test_pair_converters_roundtrip(rng):
    a = _c(rng, (4, 3))
    np.testing.assert_allclose(to_complex(to_pair_np(a)), a, atol=1e-6)
    # real input -> zero imaginary part
    r = rng.standard_normal((4, 3)).astype(np.float32)
    p = to_pair_np(r)
    assert p.shape == (4, 3, 2)
    np.testing.assert_array_equal(p[..., 1], 0)
    # device-side converter agrees
    pd = np.asarray(to_pair(jnp.asarray(a)))
    np.testing.assert_allclose(pd, to_pair_np(a), atol=1e-6)
