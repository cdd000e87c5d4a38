"""Test config: run everything on a virtual 8-device CPU mesh.

Must set env BEFORE jax is imported anywhere; pytest imports conftest first.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may preset a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep tests deterministic / quiet.
os.environ.setdefault("JAX_ENABLE_X64", "0")

# This image pre-imports jax from sitecustomize, so the env var above was
# already snapshotted into jax.config — override the live config too.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-bound (XLA:CPU builds
# of the U-Nets dominate wall time), and shapes are deterministic across
# runs — warm runs cut e.g. the 3-D U-Net test from ~60 s to ~2 s. The
# cache key includes jaxlib + HLO, so code changes re-compile as needed.
os.environ.setdefault("JAX_TEST_COMPILE_CACHE", "/tmp/jax_test_cache")
if os.environ["JAX_TEST_COMPILE_CACHE"] != "off":
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_TEST_COMPILE_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(2024)
