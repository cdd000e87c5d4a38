"""Measure the one-dispatch vmapped preprocess volume chain on the TPU.

Times (a) compile, (b) warm whole-volume wall time at the bench shape
(36 slices of 640x368 k-space -> 320^2 z-scored tensors), plus the
per-slice body_mask with fixed vs dynamic connected-component sweeps.

Run:  nohup python scripts/measure_preprocess.py > /tmp/measure_preprocess.log 2>&1 &
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from mri_acl_imagesegmentation_adsp_tpu.utils.compile_cache import (
    enable_compilation_cache)
enable_compilation_cache()

import jax
import jax.numpy as jnp

from mri_acl_imagesegmentation_adsp_tpu.data.preprocess import (
    MRIKneePreprocessor)
from mri_acl_imagesegmentation_adsp_tpu.ops.maskops import body_mask


def main():
    print("devices:", jax.devices(), flush=True)
    slices = 36
    rng = np.random.default_rng(0)
    img = np.zeros((slices, 640, 368), np.float32)
    img[:, 160:480, 90:280] = 1.0 + 0.2 * rng.standard_normal(
        (slices, 320, 190)).astype(np.float32)
    ksp = np.fft.fftshift(np.fft.fft2(
        np.fft.ifftshift(img, axes=(-2, -1)), norm="ortho"), axes=(-2, -1))
    pair = np.stack([ksp.real, ksp.imag], -1).astype(np.float32)

    pre = MRIKneePreprocessor(slice_keep=(0.0, 1.0))
    t0 = time.perf_counter()
    out = pre.preprocess_volume_pairs(pair)          # compile + run
    t1 = time.perf_counter()
    print(f"vmapped volume chain compile+run: {t1-t0:.1f} s", flush=True)
    assert out["tensor"].shape == (slices, 1, 320, 320)

    for _ in range(2):
        t0 = time.perf_counter()
        out = pre.preprocess_volume_pairs(pair)
        t1 = time.perf_counter()
        print(f"warm volume ({slices} slices): {t1-t0:.3f} s = "
              f"{slices/(t1-t0):.1f} slices/s", flush=True)

    # body_mask alone, batched: fixed sweeps vs dynamic while_loop
    one = jnp.asarray(img)
    bm_fixed = jax.jit(jax.vmap(lambda s: body_mask(s)))
    r = bm_fixed(one); r.block_until_ready(); np.asarray(r[0, :2, :2])
    t0 = time.perf_counter()
    r = bm_fixed(one); r.block_until_ready()
    t1 = time.perf_counter()
    print(f"body_mask fixed-sweep batched: {(t1-t0)/slices*1e3:.2f} "
          f"ms/slice", flush=True)


if __name__ == "__main__":
    main()
