"""Native (C++) runtime components, loaded via ctypes.

Currently: a ZIP/deflate npz reader (npz_loader.cc) used by the HBM
slice-store ingest, and an HDF5 slab reader (h5_reader.cc) that
parallelizes gzip-chunk decompression for raw k-space files. Compiled on
first use with g++ (cached next to the source); every consumer has a
pure-Python fallback (NumPy / h5py), so the framework works without a
toolchain.
"""

from .loader import (native_available, load_npz_member,
                     load_volume_npz, load_volumes_npz)
from .h5loader import native_h5_available, read_h5_slab, load_h5_slab

__all__ = ["native_available", "load_npz_member", "load_volume_npz",
           "load_volumes_npz", "native_h5_available", "read_h5_slab",
           "load_h5_slab"]
