"""Per-stage timing of the preprocess volume chain on the TPU (batched over
36 slices of 640x368) to find where the 100 ms/slice actually goes.

Run:  nohup python scripts/profile_preprocess_stages.py > /tmp/prof_pre.log 2>&1 &
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

from mri_acl_imagesegmentation_adsp_tpu.ops import (
    ifft2c_magnitude, percentile_clip, otsu_threshold, resize_bilinear,
    zscore_in_mask, preview_01, binary_opening, binary_closing, disk,
)
from mri_acl_imagesegmentation_adsp_tpu.ops.maskops import (
    label_components, remove_small_objects)

S, H, W = 36, 640, 368


def _sync(out):
    """Force execution on backends where block_until_ready is unreliable:
    transfer ONE element of every output leaf (waits for the buffer).
    Scalar indexing, NOT ravel() — reshaping a trailing-pair array
    materializes a 64x-padded tiled layout on this backend."""
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf[(0,) * leaf.ndim])


def timeit(name, fn, *args, reps=4):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    t1 = time.perf_counter()
    ms = (t1 - t0) / reps * 1e3
    print(f"{name:32s} {ms:8.1f} ms/vol  {ms/S:6.2f} ms/slice", flush=True)
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    img_np = np.zeros((S, H, W), np.float32)
    img_np[:, 160:480, 90:280] = 1.0 + 0.2 * rng.standard_normal(
        (S, 320, 190)).astype(np.float32)
    ksp = np.fft.fftshift(np.fft.fft2(
        np.fft.ifftshift(img_np, axes=(-2, -1)), norm="ortho"),
        axes=(-2, -1))
    pair = jnp.asarray(np.stack([ksp.real, ksp.imag], -1).astype(np.float32))

    vm = lambda f: jax.jit(jax.vmap(f))

    from mri_acl_imagesegmentation_adsp_tpu.data.preprocess import (
        MRIKneePreprocessor)
    pre = MRIKneePreprocessor(slice_keep=(0.0, 1.0))
    timeit("FULL fused volume chain",
           lambda p: pre._volume_chain_vmapped(p, True), pair)

    img = timeit("ifft2c_magnitude", vm(ifft2c_magnitude), pair)
    srt = timeit("jnp.sort (shared)",
                 jax.jit(lambda x: jnp.sort(x.reshape(S, -1), axis=1)), img)
    clipped = timeit("percentile_clip(1,99.5)",
                     vm(lambda x: percentile_clip(x, 1.0, 99.5)), img)

    def bm_sorted(x, s):
        from mri_acl_imagesegmentation_adsp_tpu.ops.maskops import body_mask
        return body_mask(x, sorted_values=s, with_cc_flag=True)
    timeit("body_mask sorted+cert (fused)",
           jax.jit(jax.vmap(bm_sorted)), clipped,
           jax.jit(lambda s: jnp.sort(s.reshape(S, -1), 1))(clipped))

    def norm01(x):
        v = x - jnp.min(x)
        return v / jnp.maximum(jnp.max(v), 1e-30)
    v01 = jax.jit(jax.vmap(norm01))(clipped)
    th = timeit("otsu_threshold (compare-reduce)", vm(otsu_threshold), v01)
    m0 = jax.jit(jax.vmap(lambda v, t: v > t))(v01, th)

    se = disk(2)
    m1 = timeit("open+close disk(2)",
                vm(lambda m: binary_closing(binary_opening(m, se), se)), m0)
    timeit("label_components fixed4+check",
           vm(lambda m: label_components(m, sweeps=4, check=True)), m1)
    timeit("remove_small(label+bincount)",
           vm(lambda m: remove_small_objects(m, 256, sweeps=4)), m1)

    lbl = jax.jit(jax.vmap(lambda m: label_components(m, sweeps=4)))(m1)

    def bincount_keep(lbl_s, m_s):
        counts = jnp.bincount(lbl_s.ravel(), length=H * W + 1)
        return jnp.logical_and(m_s, counts[lbl_s] >= 256)
    timeit("bincount+keep alone", vm(bincount_keep), lbl, m1)

    mk = jax.jit(jax.vmap(bincount_keep))(lbl, m1)
    img_r = timeit("resize 320^2 (img+mask)",
                   vm(lambda a, b: (resize_bilinear(a, (320, 320)),
                                    resize_bilinear(b.astype(jnp.float32),
                                                    (320, 320)) > 0.5)),
                   clipped, mk)
    timeit("zscore+preview",
           vm(lambda a, b: (zscore_in_mask(a, b.astype(jnp.uint8)),
                            preview_01(a, b.astype(jnp.uint8)))),
           img_r[0], img_r[1])

    # raw sort cost for reference (percentile's building block)
    timeit("jnp.sort 235k/slice", jax.jit(lambda x: jnp.sort(
        x.reshape(S, -1), axis=1)), img)

    # device->host download cost of the chain outputs (tensor+preview+mask)
    z = jax.jit(lambda a: (a[..., :320, :320] * 1.0,
                           a[..., :320, :320] * 2.0,
                           (a[..., :320, :320] > 0).astype(jnp.uint8)))(img)
    _sync(z)
    t0 = time.perf_counter()
    for part in z:
        np.asarray(part)
    t1 = time.perf_counter()
    print(f"download 2xf32+u8 (36,320,320): {(t1-t0)*1e3:.0f} ms",
          flush=True)


if __name__ == "__main__":
    main()
