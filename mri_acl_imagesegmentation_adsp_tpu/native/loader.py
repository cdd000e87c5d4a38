"""ctypes bindings for the native npz loader (npz_loader.cc).

Compiles libnpzloader.so on first import (cached; ~1 s), falls back to
NumPy when g++/zlib are unavailable. The C calls release the GIL, so
``ThreadPoolExecutor`` in the slice store gets real parallel inflate on
multi-core hosts.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "npz_loader.cc")
_SO = os.path.join(_HERE, "libnpzloader.so")

_lib = None
_lock = threading.Lock()

class _VolumeOut(ctypes.Structure):
    """Mirror of npz_loader.cc's VolumeOut (natural C alignment)."""
    _fields_ = [
        ("img_data", ctypes.c_void_p), ("img_shape", ctypes.c_int64 * 8),
        ("img_ndim", ctypes.c_int32), ("img_itemsize", ctypes.c_int32),
        ("img_kind", ctypes.c_char),
        ("msk_data", ctypes.c_void_p), ("msk_shape", ctypes.c_int64 * 8),
        ("msk_ndim", ctypes.c_int32), ("msk_itemsize", ctypes.c_int32),
        ("msk_kind", ctypes.c_char),
        ("rc", ctypes.c_int32),
    ]


_KIND_TO_DTYPE = {
    ("f", 4): np.float32, ("f", 8): np.float64,
    ("u", 1): np.uint8, ("i", 1): np.int8,
    ("i", 2): np.int16, ("u", 2): np.uint16,
    ("i", 4): np.int32, ("u", 4): np.uint32,
    ("i", 8): np.int64, ("u", 8): np.uint64,
}


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", _SRC, "-lz",
             "-o", _SO],
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
            lib = ctypes.CDLL(so)
        except OSError:
            # prebuilt .so from a different host (arch/glibc) -> NumPy path
            _lib = "unavailable"
            return None
        lib.npz_probe.restype = ctypes.c_int
        lib.npz_probe.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_char)]
        lib.npz_load.restype = ctypes.c_int
        lib.npz_load.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                 ctypes.c_void_p, ctypes.c_int64]
        lib.npz_load_volume.restype = ctypes.c_int
        lib.npz_load_volume.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_char),
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_char)]
        lib.npz_free.restype = None
        lib.npz_free.argtypes = [ctypes.c_void_p]
        lib.npz_load_volumes.restype = ctypes.c_int
        lib.npz_load_volumes.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(_VolumeOut)]
        _lib = lib
        return lib


def native_available() -> bool:
    return _get_lib() is not None


def load_npz_member(path: str, member: str) -> Optional[np.ndarray]:
    """Load one .npy member of an npz via the native reader (None on any
    failure -> caller falls back to np.load)."""
    lib = _get_lib()
    if lib is None:
        return None
    shape = (ctypes.c_int64 * 8)()
    itemsize = ctypes.c_int()
    kind = ctypes.c_char()
    ndim = lib.npz_probe(path.encode(), member.encode(), shape,
                         ctypes.byref(itemsize), ctypes.byref(kind))
    if ndim < 0:
        return None
    dims = tuple(int(shape[i]) for i in range(ndim))
    dtype = _KIND_TO_DTYPE.get((kind.value.decode(), itemsize.value))
    if dtype is None:
        return None
    out = np.empty(dims, dtype=dtype)
    rc = lib.npz_load(path.encode(), member.encode(),
                      out.ctypes.data_as(ctypes.c_void_p), out.nbytes)
    if rc != 0:
        return None
    return out


def load_volume_npz(path: str) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Load (img, msk) from a packer volume.npz in ONE file pass (fused C
    call: one read + one inflate per member); None -> caller falls back."""
    lib = _get_lib()
    if lib is None:
        return None
    img_p, msk_p = ctypes.c_void_p(), ctypes.c_void_p()
    img_shape = (ctypes.c_int64 * 8)()
    msk_shape = (ctypes.c_int64 * 8)()
    img_nd, msk_nd = ctypes.c_int(), ctypes.c_int()
    img_is, msk_is = ctypes.c_int(), ctypes.c_int()
    img_k, msk_k = ctypes.c_char(), ctypes.c_char()
    rc = lib.npz_load_volume(
        path.encode(),
        ctypes.byref(img_p), img_shape, ctypes.byref(img_nd),
        ctypes.byref(img_is), ctypes.byref(img_k),
        ctypes.byref(msk_p), msk_shape, ctypes.byref(msk_nd),
        ctypes.byref(msk_is), ctypes.byref(msk_k))
    try:
        if rc != 0:
            return None

        def wrap(ptr, shape_arr, nd, isz, kind):
            dims = tuple(int(shape_arr[i]) for i in range(nd.value))
            dtype = _KIND_TO_DTYPE.get((kind.value.decode(), isz.value))
            if dtype is None:
                return None
            n = int(np.prod(dims)) * np.dtype(dtype).itemsize
            buf = (ctypes.c_uint8 * n).from_address(ptr.value)
            return np.frombuffer(buf, dtype=dtype).reshape(dims).copy()

        img = wrap(img_p, img_shape, img_nd, img_is, img_k)
        msk = wrap(msk_p, msk_shape, msk_nd, msk_is, msk_k)
        if img is None or msk is None:
            return None
        return img, msk
    finally:
        if img_p.value:
            lib.npz_free(img_p)
        if msk_p.value:
            lib.npz_free(msk_p)


def _wrap_raw(ptr: int, shape_arr, ndim: int, itemsize: int,
              kind: bytes) -> Optional[np.ndarray]:
    dims = tuple(int(shape_arr[i]) for i in range(ndim))
    dtype = _KIND_TO_DTYPE.get((kind.decode(), itemsize))
    if dtype is None:
        return None
    n = int(np.prod(dims)) * np.dtype(dtype).itemsize
    buf = (ctypes.c_uint8 * n).from_address(ptr)
    return np.frombuffer(buf, dtype=dtype).reshape(dims).copy()


def load_volumes_npz(paths, threads: int = 8):
    """Multi-threaded native readahead: load many volume.npz archives with
    a C++ thread pool (npz_load_volumes — no Python threads, no GIL
    round-trips between files). Returns a list aligned with ``paths``
    whose entries are (img, msk) or None (per-volume fallback marker);
    returns None wholesale when the native library is unavailable."""
    lib = _get_lib()
    if lib is None:
        return None
    n = len(paths)
    if n == 0:
        return []
    outs = (_VolumeOut * n)()
    carr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.npz_load_volumes(carr, n, int(threads), outs)
    results = []
    try:
        for o in outs:
            if o.rc != 0 or not o.img_data or not o.msk_data:
                results.append(None)
                continue
            img = _wrap_raw(o.img_data, o.img_shape, o.img_ndim,
                            o.img_itemsize, o.img_kind)
            msk = _wrap_raw(o.msk_data, o.msk_shape, o.msk_ndim,
                            o.msk_itemsize, o.msk_kind)
            results.append(None if img is None or msk is None
                           else (img, msk))
    finally:
        for o in outs:
            if o.img_data:
                lib.npz_free(o.img_data)
            if o.msk_data:
                lib.npz_free(o.msk_data)
    return results
