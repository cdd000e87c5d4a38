"""ctypes bindings for the native HDF5 slab reader (h5_reader.cc).

``read_h5_slab(path, dset, indices, axis)`` reads
``dataset[..., indices, ...]`` (``indices`` selecting along ``axis``) with a
C++ thread pool: libhdf5 is entered only for a short metadata pass; raw
chunks are pread(2) + zlib-inflated + unshuffled + scattered concurrently,
bypassing h5py's global lock. Returns None whenever the native path cannot
serve the request (no toolchain, no libhdf5, big-endian/exotic filters,
compact layout) — callers fall back to h5py, so behavior is always
h5py-equivalent (pinned in tests/test_h5_reader.py).

Why: the recon datasets read ``kspace[:, slice]`` per training example
(vendored DL_reconstruction/data/mri_data.py:223-340) and the segmentation
adapter bulk-loads whole volumes (reference src/adapters/fastmri_adapter.py);
both are gzip-chunked in fastMRI releases, and h5py serializes all
decompression behind one lock.

Honesty note: this repo's bench VM has ONE core, so the parallel win is not
measurable here (native == h5py at the single-core inflate rate). The value
on this host is architectural (scales with cores on real TPU hosts) plus
correctness-pinned slab selection that reads only intersecting chunks.
"""

from __future__ import annotations

import ctypes
import glob
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "h5_reader.cc")
_SO = os.path.join(_HERE, "libh5reader.so")

_lib = None
_lock = threading.Lock()


def _candidate_hdf5_libs():
    """System libhdf5 .so candidates ONLY. h5py's bundled copy is
    deliberately NOT a candidate: dlopen of a path the process already
    loaded returns the SAME library instance (RTLD_LOCAL hides symbols,
    it does not duplicate global state), so our C++ threads would share
    one non-thread-safe serial HDF5 with h5py's own calls — h5py's lock
    and our mutex would each protect only half the callers. A host
    without a system libhdf5 simply runs the h5py fallback path."""
    pats = [
        "/lib/x86_64-linux-gnu/libhdf5_serial.so*",
        "/usr/lib/x86_64-linux-gnu/libhdf5_serial.so*",
        "/usr/lib/libhdf5_serial.so*",
        "/usr/lib/x86_64-linux-gnu/libhdf5.so*",
    ]
    out = []
    for p in pats:
        out.extend(sorted(glob.glob(p)))
    return out


def _build() -> Optional[str]:
    if (os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", _SRC, "-lz",
             "-ldl", "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def _get_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib if _lib != "unavailable" else None
        so = _build()
        if so is None:
            _lib = "unavailable"
            return None
        try:
            # guarded: a prebuilt .so from a different host (arch/glibc)
            # must degrade to the h5py fallback, not crash every consumer
            lib = ctypes.CDLL(so)
            lib.h5n_init.restype = ctypes.c_int
            lib.h5n_init.argtypes = [ctypes.c_char_p]
            lib.h5n_probe.restype = ctypes.c_int
            lib.h5n_probe.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32)]
            lib.h5n_read_slab.restype = ctypes.c_int
            lib.h5n_read_slab.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32]
            for cand in _candidate_hdf5_libs():
                if lib.h5n_init(cand.encode()) == 0:
                    _lib = lib
                    return lib
        except OSError:
            pass
        _lib = "unavailable"
        return None


def native_h5_available() -> bool:
    return _get_lib() is not None


# (path, dset) -> (mtime_ns, size, dtype, shape): avoids re-opening the
# file with h5py for type metadata on every per-slice read (the native
# side keeps its own chunk-table cache keyed the same way)
_meta_cache: dict = {}


def _dtype_shape(path: str, dset: str):
    st = os.stat(path)
    key = (path, dset)
    hit = _meta_cache.get(key)
    if hit is not None and hit[0] == st.st_mtime_ns and hit[1] == st.st_size:
        return hit[2], hit[3]
    import h5py
    with h5py.File(path, "r") as hf:
        node = hf.get(dset)
        if node is None or not hasattr(node, "dtype"):
            return None, None
        dtype, shape = node.dtype, node.shape
    if len(_meta_cache) > 4096:
        _meta_cache.clear()
    _meta_cache[key] = (st.st_mtime_ns, st.st_size, dtype, shape)
    return dtype, shape


def read_h5_slab(path: str, dset: str, indices: Sequence[int],
                 axis: int = 0,
                 threads: Optional[int] = None) -> Optional[np.ndarray]:
    """Native parallel read of ``dataset[..., indices, ...]``.

    Returns an array shaped like the dataset with ``shape[axis]``
    replaced by ``len(indices)``, or None on any unsupported case —
    callers must fall back to h5py. dtype comes from h5py metadata (one
    cheap open; the bulk decompression is what the native path offloads).
    """
    lib = _get_lib()
    if lib is None:
        return None
    if threads is None:
        threads = os.cpu_count() or 1  # C side also caps at hw concurrency
    idx = np.asarray(indices, dtype=np.int64).ravel()
    if idx.size == 0 or len(set(idx.tolist())) != idx.size:
        return None
    try:
        dtype, shape = _dtype_shape(path, dset)
    except Exception:
        return None
    if dtype is None:
        return None
    if axis < 0:
        axis += len(shape)
    if not 0 <= axis < len(shape):
        return None
    # Cross-check the native view of the file agrees before trusting it.
    cshape = (ctypes.c_int64 * 8)()
    itemsize = ctypes.c_int32()
    ndim = lib.h5n_probe(path.encode(), dset.encode(), cshape,
                         ctypes.byref(itemsize))
    if (ndim != len(shape) or itemsize.value != dtype.itemsize
            or tuple(cshape[i] for i in range(ndim)) != tuple(shape)):
        return None
    out_shape = tuple(idx.size if d == axis else shape[d]
                      for d in range(ndim))
    out = np.empty(out_shape, dtype=dtype)
    rc = lib.h5n_read_slab(
        path.encode(), dset.encode(),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        idx.size, axis, out.ctypes.data_as(ctypes.c_void_p), out.nbytes,
        int(threads))
    if rc != 0:
        return None
    return out


def load_h5_slab(path: str, dset: str, indices: Sequence[int],
                 axis: int = 0, threads: Optional[int] = None) -> np.ndarray:
    """``dataset[..., indices, ...]`` with the native reader when possible,
    h5py otherwise — always returns the data (public entry point)."""
    out = read_h5_slab(path, dset, indices, axis=axis, threads=threads)
    if out is not None:
        return out
    import h5py
    with h5py.File(path, "r") as hf:
        data = hf[dset]
        sel = [slice(None)] * data.ndim
        ax = axis if axis >= 0 else axis + data.ndim
        # h5py fancy selection wants strictly increasing, duplicate-free
        # indices; read the unique set and gather back into request order
        uniq, inv = np.unique(np.asarray(list(indices), np.int64),
                              return_inverse=True)
        sel[ax] = uniq
        arr = data[tuple(sel)]
        return np.take(arr, inv, axis=ax)
