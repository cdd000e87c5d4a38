"""Native (C++) runtime components, loaded via ctypes.

Currently: a ZIP/deflate npz reader (npz_loader.cc) used by the HBM
slice-store ingest. Compiled on first use with g++ (cached next to the
source); every consumer has a pure-NumPy fallback, so the framework works
without a toolchain.
"""

from .loader import (native_available, load_npz_member,
                     load_volume_npz, load_volumes_npz)

__all__ = ["native_available", "load_npz_member", "load_volume_npz",
           "load_volumes_npz"]
