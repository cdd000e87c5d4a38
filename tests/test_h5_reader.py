"""Native HDF5 slab reader: bit-exact h5py parity + graceful fallback.

The native path (native/h5_reader.cc) must agree with h5py on every
supported layout and return None (public wrapper falls back to h5py) on
anything out of scope. Also covers the Prefetcher ordering/exception
contract and the SliceDataset consumers staying h5py-equivalent.
"""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from mri_acl_imagesegmentation_adsp_tpu.native import (  # noqa: E402
    load_h5_slab, native_h5_available, read_h5_slab)


@pytest.fixture(scope="module")
def fixture_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("h5") / "fixture.h5"
    rng = np.random.default_rng(7)
    data = {
        # gzip-chunked complex64 with non-dividing chunks on every axis —
        # the fastMRI kspace layout (edge-chunk padding exercised)
        "kspace": ((rng.standard_normal((5, 7, 3, 24, 18))
                    + 1j * rng.standard_normal((5, 7, 3, 24, 18)))
                   .astype(np.complex64),
                   dict(chunks=(2, 3, 2, 10, 7), compression="gzip")),
        "contig": (rng.standard_normal((6, 11, 9)).astype(np.float32), {}),
        "shuffled": (rng.integers(-500, 500, (4, 13, 6)).astype(np.int16),
                     dict(chunks=(3, 5, 6), compression="gzip",
                          shuffle=True)),
        "onedim": (rng.standard_normal(17).astype(np.float64),
                   dict(chunks=(4,), compression="gzip")),
        "fletcher": (rng.standard_normal((4, 8)).astype(np.float32),
                     dict(chunks=(2, 8), fletcher32=True)),
    }
    with h5py.File(p, "w") as f:
        for name, (arr, kw) in data.items():
            f.create_dataset(name, data=arr, **kw)
        f.attrs["max"] = 1.25
    return p, data


def test_native_is_available():
    # this image ships g++ and libhdf5; if this fails the whole native
    # path silently degrades to h5py, which defeats the component
    assert native_h5_available()


@pytest.mark.parametrize("dset,axis,idx", [
    ("kspace", 1, [3]),            # the kspace[:, slice] pattern
    ("kspace", 1, [6, 0, 4]),      # unsorted multi-index
    ("kspace", 0, list(range(5))),  # full volume
    ("kspace", 4, [17, 2]),        # last axis: per-element scatter path
    ("contig", 0, [5, 1]),
    ("contig", 2, [8, 0, 3]),
    ("shuffled", 0, [2, 1]),
    ("shuffled", 2, [5, 4, 0]),
    ("onedim", 0, [16, 3, 0]),
])
def test_native_matches_h5py(fixture_file, dset, axis, idx):
    p, data = fixture_file
    got = read_h5_slab(str(p), dset, idx, axis=axis)
    assert got is not None, "native path unexpectedly fell back"
    ref = np.take(data[dset][0], idx, axis=axis)
    assert got.dtype == ref.dtype
    np.testing.assert_array_equal(got, ref)


def test_unsupported_filter_falls_back(fixture_file):
    p, data = fixture_file
    # fletcher32 is outside native scope: raw path must decline...
    assert read_h5_slab(str(p), "fletcher", [1], axis=0) is None
    # ...and the public wrapper must still serve it via h5py
    got = load_h5_slab(str(p), "fletcher", [3, 1], axis=0)
    np.testing.assert_array_equal(got, data["fletcher"][0][[3, 1]])


def test_bad_requests_fall_back_not_crash(fixture_file):
    p, _ = fixture_file
    assert read_h5_slab(str(p), "missing_dataset", [0]) is None
    assert read_h5_slab(str(p), "kspace", [99], axis=1) is None
    assert read_h5_slab(str(p), "kspace", [1, 1], axis=1) is None  # dup
    assert read_h5_slab(str(p), "kspace", [], axis=1) is None
    assert read_h5_slab("/nonexistent/file.h5", "kspace", [0]) is None


def test_load_h5_slab_negative_axis(fixture_file):
    p, data = fixture_file
    got = load_h5_slab(str(p), "contig", [7, 2], axis=-2)
    np.testing.assert_array_equal(got, data["contig"][0][:, [7, 2]])


def test_load_h5_slab_duplicate_indices(fixture_file):
    """Duplicates route to the h5py fallback, which must gather them
    (h5py itself rejects non-unique fancy selections)."""
    p, data = fixture_file
    got = load_h5_slab(str(p), "contig", [3, 3, 1], axis=0)
    np.testing.assert_array_equal(got, data["contig"][0][[3, 3, 1]])


def test_meta_cache_invalidates_on_rewrite(tmp_path):
    """Both metadata caches (Python dtype/shape, C++ chunk table) key on
    (mtime_ns, size); rewriting the file must serve the NEW bytes."""
    p = tmp_path / "rw.h5"
    for round_ in range(2):
        arr = np.full((3, 8), float(round_), np.float32)
        with h5py.File(p, "w") as f:
            f.create_dataset("d", data=arr, chunks=(2, 8),
                             compression="gzip")
        got = load_h5_slab(str(p), "d", [1], axis=0)
        np.testing.assert_array_equal(got, arr[[1]])


def test_prefetcher_order_and_len():
    from mri_acl_imagesegmentation_adsp_tpu.data.prefetch import (
        Prefetcher, prefetch)

    class Squares:
        def __len__(self):
            return 23

        def __getitem__(self, i):
            return i * i

    pf = Prefetcher(Squares(), depth=4, workers=3)
    assert len(pf) == 23
    assert list(pf) == [i * i for i in range(23)]
    assert list(pf) == [i * i for i in range(23)]  # reusable
    assert prefetch(Squares(), 0) .__class__ is Squares  # identity when off


def test_prefetcher_propagates_exceptions():
    from mri_acl_imagesegmentation_adsp_tpu.data.prefetch import Prefetcher

    class Boom:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            if i == 3:
                raise RuntimeError("bad record")
            return i

    out = []
    with pytest.raises(RuntimeError, match="bad record"):
        for x in Prefetcher(Boom(), depth=2, workers=2):
            out.append(x)
    assert out == [0, 1, 2]  # everything before the bad index arrived


def test_fastmri_adapter_uses_native_path(tmp_path):
    """Adapter bulk + per-record loads stay byte-identical to raw h5py."""
    from mri_acl_imagesegmentation_adsp_tpu.data.adapters import (
        FastMRISinglecoilAdapter)

    rng = np.random.default_rng(3)
    ks = (rng.standard_normal((4, 20, 14))
          + 1j * rng.standard_normal((4, 20, 14))).astype(np.complex64)
    rss = rng.standard_normal((4, 10, 10)).astype(np.float64)
    with h5py.File(tmp_path / "vol.h5", "w") as f:
        f.create_dataset("kspace", data=ks, chunks=(1, 10, 14),
                         compression="gzip")
        f.create_dataset("reconstruction_rss", data=rss, chunks=(2, 10, 10),
                         compression="gzip")

    ad = FastMRISinglecoilAdapter(root_dir=str(tmp_path))
    rec = ad.load_record({"filepath": str(tmp_path / "vol.h5"),
                          "slice_idx": 2})
    np.testing.assert_array_equal(rec["kspace"], ks[2])
    np.testing.assert_array_equal(rec["target"], rss[2])

    vol = ad.load_volume(str(tmp_path / "vol.h5"))
    pair = np.stack([ks.real, ks.imag], axis=-1).astype(np.float32)
    np.testing.assert_array_equal(vol["kspace_pair"], pair)
    np.testing.assert_array_equal(vol["target"], rss.astype(np.float32))
    assert len(vol["metas"]) == 4
