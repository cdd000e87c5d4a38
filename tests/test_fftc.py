"""Golden tests for ops.fftc vs NumPy oracles (reference src/utils/kspace.py)."""
import numpy as np
import jax.numpy as jnp

from mri_acl_imagesegmentation_adsp_tpu.ops import (
    fft2c, ifft2c, fft2c_pair, ifft2c_pair, pair_abs, to_pair,
    ifft2c_magnitude, complex_abs, rss, rss_complex,
    center_crop_or_pad,
)


def _np_fft2c(x):
    return np.fft.fftshift(
        np.fft.fft2(np.fft.ifftshift(x, axes=(-2, -1)), norm="ortho"),
        axes=(-2, -1))


def _np_ifft2c(x):
    return np.fft.fftshift(
        np.fft.ifft2(np.fft.ifftshift(x, axes=(-2, -1)), norm="ortho"),
        axes=(-2, -1))


def _np_center_crop_or_pad(img, out_h, out_w):
    h, w = img.shape[-2], img.shape[-1]
    out = np.zeros((*img.shape[:-2], out_h, out_w), dtype=img.dtype)
    hmin, wmin = min(h, out_h), min(w, out_w)
    h0, w0 = (h - hmin) // 2, (w - wmin) // 2
    H0, W0 = (out_h - hmin) // 2, (out_w - wmin) // 2
    out[..., H0:H0 + hmin, W0:W0 + wmin] = img[..., h0:h0 + hmin, w0:w0 + wmin]
    return out


def _complex(rng, shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)


def test_fft2c_matches_numpy(rng):
    for shape in [(32, 32), (31, 45), (3, 64, 40)]:
        x = _complex(rng, shape)
        got = np.asarray(fft2c(jnp.asarray(x)))
        np.testing.assert_allclose(got, _np_fft2c(x), rtol=1e-4, atol=1e-4)


def test_ifft2c_matches_numpy(rng):
    for shape in [(32, 32), (31, 45), (2, 5, 64, 40)]:
        x = _complex(rng, shape)
        got = np.asarray(ifft2c(jnp.asarray(x)))
        np.testing.assert_allclose(got, _np_ifft2c(x), rtol=1e-4, atol=1e-4)


def test_fft_roundtrip(rng):
    x = _complex(rng, (64, 48))
    back = np.asarray(ifft2c(fft2c(jnp.asarray(x))))
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-5)


def test_ifft2c_magnitude_matches_reference_recon(rng):
    """Oracle = reference mri_preprocess.py:149-160 (ifft2c_single)."""
    k = _complex(rng, (64, 40))
    expect = np.abs(_np_ifft2c(k)).astype(np.float32)
    got = np.asarray(ifft2c_magnitude(jnp.asarray(k)))
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_complex_abs(rng):
    x = _complex(rng, (16, 16))
    np.testing.assert_allclose(
        np.asarray(complex_abs(jnp.asarray(x))),
        np.sqrt(x.real ** 2 + x.imag ** 2), rtol=1e-5, atol=1e-6)


def test_rss_matches_coil_combine(rng):
    """Oracle = vendored coil_combine.py rss/rss_complex semantics."""
    coils = rng.standard_normal((8, 32, 32)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(rss(jnp.asarray(coils), axis=0)),
        np.sqrt((coils ** 2).sum(0)), rtol=1e-5, atol=1e-5)

    ck = _complex(rng, (8, 32, 32))
    np.testing.assert_allclose(
        np.asarray(rss_complex(jnp.asarray(ck), axis=0)),
        np.sqrt((np.abs(ck) ** 2).sum(0)), rtol=1e-4, atol=1e-5)


def test_center_crop_or_pad_all_modes(rng):
    img = rng.standard_normal((37, 53)).astype(np.float32)
    for out_h, out_w in [(20, 20), (64, 64), (20, 64), (64, 20), (37, 53)]:
        got = np.asarray(center_crop_or_pad(jnp.asarray(img), out_h, out_w))
        np.testing.assert_array_equal(got, _np_center_crop_or_pad(img, out_h, out_w))


def test_pair_api_matches_complex_api(rng):
    """Real-pair (TPU path) and complex (host path) must agree exactly."""
    x = _complex(rng, (48, 40))
    xp = np.asarray(to_pair(jnp.asarray(x)))
    np.testing.assert_allclose(xp[..., 0], x.real, atol=1e-6)
    np.testing.assert_allclose(xp[..., 1], x.imag, atol=1e-6)

    got_f = np.asarray(fft2c_pair(jnp.asarray(xp)))
    expect_f = _np_fft2c(x)
    np.testing.assert_allclose(got_f[..., 0], expect_f.real, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got_f[..., 1], expect_f.imag, rtol=1e-4, atol=1e-4)

    got_i = np.asarray(ifft2c_pair(jnp.asarray(xp)))
    expect_i = _np_ifft2c(x)
    np.testing.assert_allclose(got_i[..., 0], expect_i.real, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got_i[..., 1], expect_i.imag, rtol=1e-4, atol=1e-4)

    np.testing.assert_allclose(
        np.asarray(pair_abs(jnp.asarray(got_i))), np.abs(expect_i),
        rtol=1e-4, atol=1e-5)


def test_ifft2c_magnitude_accepts_pair_input(rng):
    k = _complex(rng, (64, 40))
    expect = np.abs(_np_ifft2c(k)).astype(np.float32)
    pair = np.stack([k.real, k.imag], axis=-1).astype(np.float32)
    got = np.asarray(ifft2c_magnitude(jnp.asarray(pair)))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_rss_complex_pair_input(rng):
    ck = _complex(rng, (8, 32, 32))
    pair = np.stack([ck.real, ck.imag], axis=-1).astype(np.float32)
    got = np.asarray(rss_complex(jnp.asarray(pair), axis=0))
    np.testing.assert_allclose(got, np.sqrt((np.abs(ck) ** 2).sum(0)),
                               rtol=1e-4, atol=1e-5)


def test_center_crop_or_pad_batched(rng):
    img = rng.standard_normal((3, 2, 30, 40)).astype(np.float32)
    got = np.asarray(center_crop_or_pad(jnp.asarray(img), 25, 50))
    np.testing.assert_array_equal(got, _np_center_crop_or_pad(img, 25, 50))
