"""Measure raw host<->device link throughput on the attached TPU.

The preprocess corpus path is transfer-bound on remote-attached chips
(BENCH extras: device chain ~10 ms/slice vs ~74 ms/slice sustained), so the
achievable sustained rate is set by this link, not the chip. This probe
separates upload (jnp.asarray) and download (np.asarray) bandwidth across
payload sizes/dtypes, and checks whether concurrent upload+download
overlap (the pipelined loader's assumption).

Run:  nohup python scripts/measure_link.py > /tmp/measure_link.log 2>&1 &
"""
import sys
import time
import threading

import numpy as np

sys.path.insert(0, ".")

from mri_acl_imagesegmentation_adsp_tpu.utils.compile_cache import (
    enable_compilation_cache)
enable_compilation_cache()

import jax
import jax.numpy as jnp


def up(arr, reps=3):
    x = jnp.asarray(arr)          # warm (allocator path)
    np.asarray(x[(0,) * x.ndim])
    t0 = time.perf_counter()
    for _ in range(reps):
        x = jnp.asarray(arr)
        np.asarray(x[(0,) * x.ndim])
    dt = (time.perf_counter() - t0) / reps
    return arr.nbytes / dt / 1e6, x


def down(x, reps=3):
    np.asarray(x)                 # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = np.asarray(x)
    dt = (time.perf_counter() - t0) / reps
    return out.nbytes / dt / 1e6


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    for shape, dtype in [((36, 640, 368, 2), np.float32),
                         ((36, 640, 368, 2), np.float16),
                         ((36, 320, 320), np.float32),
                         ((36, 320, 320), np.uint8),
                         ((8 << 20,), np.float32),
                         ((64 << 20,), np.float32)]:
        arr = rng.standard_normal(shape).astype(dtype) if dtype != np.uint8 \
            else rng.integers(0, 255, shape, dtype=np.uint8)
        mbs_up, x = up(arr)
        mbs_dn = down(x)
        print(f"{str(shape):22s} {np.dtype(dtype).name:8s} "
              f"{arr.nbytes/1e6:8.1f} MB   up {mbs_up:8.1f} MB/s   "
              f"down {mbs_dn:8.1f} MB/s", flush=True)

    # do upload and download overlap? (pipelining assumption)
    a = rng.standard_normal((36, 640, 368, 2)).astype(np.float32)
    xa = jnp.asarray(a)
    np.asarray(xa[0, 0, 0, 0])
    t0 = time.perf_counter()
    th = threading.Thread(target=lambda: down(xa, reps=2))
    th.start()
    up(a, reps=2)
    th.join()
    both = time.perf_counter() - t0
    t0 = time.perf_counter()
    up(a, reps=2)
    down(xa, reps=2)
    seq = time.perf_counter() - t0
    print(f"concurrent up+down {both*1e3:.0f} ms vs sequential "
          f"{seq*1e3:.0f} ms -> overlap {'YES' if both < 0.75*seq else 'NO'}",
          flush=True)


if __name__ == "__main__":
    main()
