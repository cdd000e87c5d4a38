"""Persistent XLA compilation cache.

Remote TPU compiles in this environment cost 20 s – minutes per program;
a persistent on-disk cache makes every rerun of bench/CLI/driver entry
points hit warm compiles. Safe to call multiple times.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "matpu_xla_cache"))


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    import jax
    if os.environ.get("MRI_TPU_NO_COMPILE_CACHE"):
        # hermetic mode: the on-disk cache can hold XLA:CPU AOT executables
        # compiled on a DIFFERENT machine generation (this fleet migrates
        # hosts); loading them triggers feature-mismatch warnings and
        # codegen differences. The multichip dryrun opts out for
        # reproducible numerics.
        return ""
    path = cache_dir or _DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax versions; cache is best-effort
    return path
