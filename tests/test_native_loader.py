"""Native npz loader tests: C++ reader vs NumPy ground truth."""
import numpy as np
import pytest

from mri_acl_imagesegmentation_adsp_tpu.native import (
    native_available, load_npz_member, load_volume_npz,
)
from mri_acl_imagesegmentation_adsp_tpu.data.hbm_loader import SliceStore


@pytest.fixture
def npz_file(tmp_path, rng):
    img = rng.standard_normal((5, 1, 24, 20)).astype(np.float32)
    msk = (rng.random((5, 24, 20)) > 0.5).astype(np.uint8)
    p = tmp_path / "volume.npz"
    np.savez_compressed(p, img=img, msk=msk)
    return str(p), img, msk


def test_native_loader_builds():
    assert native_available(), "g++/zlib native loader must compile here"


def test_native_matches_numpy_compressed(npz_file):
    path, img, msk = npz_file
    got_img = load_npz_member(path, "img.npy")
    got_msk = load_npz_member(path, "msk.npy")
    np.testing.assert_array_equal(got_img, img)
    np.testing.assert_array_equal(got_msk, msk)
    assert got_img.dtype == np.float32
    assert got_msk.dtype == np.uint8


def test_native_matches_numpy_uncompressed(tmp_path, rng):
    img = rng.standard_normal((3, 1, 16, 16)).astype(np.float32)
    msk = rng.integers(0, 5, (3, 16, 16)).astype(np.int64)
    p = tmp_path / "u.npz"
    np.savez(p, img=img, msk=msk)  # stored, not deflated
    got = load_volume_npz(str(p))
    assert got is not None
    np.testing.assert_array_equal(got[0], img)
    np.testing.assert_array_equal(got[1], msk)


def test_native_missing_member_returns_none(tmp_path):
    p = tmp_path / "x.npz"
    np.savez(p, other=np.zeros(3))
    assert load_npz_member(str(p), "img.npy") is None


def test_slice_store_uses_native_and_matches(tmp_path, rng):
    files = []
    ref_imgs, ref_msks = [], []
    for v in range(3):
        img = rng.standard_normal((4, 1, 16, 16)).astype(np.float32)
        msk = (rng.random((4, 16, 16)) > 0.5).astype(np.uint8)
        p = tmp_path / f"v{v}.npz"
        np.savez_compressed(p, img=img, msk=msk)
        files.append(str(p))
        ref_imgs.append(img[:, 0])
        ref_msks.append(msk)
    for workers in (0, 4):
        store = SliceStore.from_files(files, workers=workers)
        np.testing.assert_array_equal(store.images,
                                      np.concatenate(ref_imgs))
        np.testing.assert_array_equal(store.masks,
                                      np.concatenate(ref_msks).astype(np.int32))


def test_bulk_threaded_loader_matches_single(tmp_path, rng):
    """npz_load_volumes (C++ thread pool) returns the same arrays as the
    per-file path, aligned with the input order; bad paths mark their slot
    None instead of failing the batch."""
    from mri_acl_imagesegmentation_adsp_tpu.native import (
        load_volumes_npz, load_volume_npz, native_available)
    if not native_available():
        import pytest
        pytest.skip("no native toolchain")
    paths = []
    for v in range(5):
        img = rng.standard_normal((3 + v, 1, 16, 16)).astype(np.float32)
        msk = (rng.random((3 + v, 16, 16)) > 0.5).astype(np.uint8)
        p = tmp_path / f"v{v}.npz"
        np.savez_compressed(p, img=img, msk=msk)
        paths.append(str(p))
    bulk = load_volumes_npz(paths, threads=4)
    assert bulk is not None and len(bulk) == 5
    for p, pair in zip(paths, bulk):
        x1, y1 = pair
        x2, y2 = load_volume_npz(p)
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(y1, y2)
    # a missing file degrades to a per-slot None
    bulk2 = load_volumes_npz(paths[:2] + [str(tmp_path / "nope.npz")],
                             threads=2)
    assert bulk2[2] is None and bulk2[0] is not None


def test_slice_store_uses_bulk_loader(tmp_path, rng):
    """SliceStore.from_files(workers>0) goes through the native bulk path
    and produces the same store as the worker-thread fallback."""
    from mri_acl_imagesegmentation_adsp_tpu.data.hbm_loader import SliceStore
    paths = []
    for v in range(3):
        img = rng.standard_normal((4, 1, 12, 12)).astype(np.float32)
        msk = (rng.random((4, 12, 12)) > 0.5).astype(np.uint8)
        p = tmp_path / f"s{v}.npz"
        np.savez_compressed(p, img=img, msk=msk)
        paths.append(str(p))
    a = SliceStore.from_files(paths, workers=4)
    b = SliceStore.from_files(paths, workers=0)
    np.testing.assert_array_equal(a.images, b.images)
    np.testing.assert_array_equal(a.masks, b.masks)
    np.testing.assert_array_equal(a.vol_sizes, b.vol_sizes)
