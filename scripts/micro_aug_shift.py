"""Micro-benchmark: the separable-warp integer line-shift stage on the TPU.

The r4 b128 epoch HLO (scripts/dump_hlo_epoch.py) showed two augmentation
costs inside the train step:
  1. 54 f32[128,320,320]{0,2,1} transpose copies (2.8 GB/step) from the
     pass-2 per-tap weight swapaxes — removed by the natural-orientation
     banded_pass refactor;
  2. the log2-roll+select chain of _int_shift_lines materializing ~8
     padded intermediates per pass (6 x 454 MB visible at b128).

This script times, at the train shape (B=128, 320^2, payload C=2 bf16):
  a) roll_chain  — the shipped _int_shift_lines (8 conditional rolls)
  b) dyn_slice   — per-line window gather via vmapped lax.dynamic_slice
                   (one read of exactly the tap window, no intermediates)
  c) full warp   — _warp_batch_separable end to end (post-refactor)

Run:  nohup python scripts/micro_aug_shift.py > /tmp/micro_aug_shift.log 2>&1 &
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

from mri_acl_imagesegmentation_adsp_tpu.train.augment import (
    _int_shift_lines, _warp_batch_separable, sample_params)

B, H, W, C = 128, 320, 320, 2
PAD, T = 71, 13   # light-recipe bounds at 320^2


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    # single-scalar fetch sync per CLAUDE.md timing rule
    s = jnp.sum(jax.tree.leaves(out)[0][..., :1, :1])
    float(s)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    s = jnp.sum(jax.tree.leaves(out)[0][..., :1, :1])
    float(s)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    m = jnp.asarray(rng.integers(-PAD + T, PAD - T, (B, H)).astype(np.int32))

    @jax.jit
    def roll_chain(z, m):
        zp = jnp.pad(z, [(0, 0), (0, 0), (PAD, PAD), (0, 0)])
        return _int_shift_lines(zp, m[:, :, None, None], 2, PAD)

    @jax.jit
    def dyn_slice(z, m):
        zp = jnp.pad(z, [(0, 0), (0, 0), (PAD, PAD), (0, 0)])
        width = W + 2 * T + 1
        start = jnp.clip(m + PAD - T, 0, zp.shape[2] - width)

        def line(row, s):           # row (W+2PAD, C) -> (width, C)
            return jax.lax.dynamic_slice(row, (s, 0), (width, C))
        return jax.vmap(jax.vmap(line))(zp, start)

    t_roll = timeit(roll_chain, z, m)
    print(f"roll_chain: {t_roll:.3f} ms", flush=True)
    t_dyn = timeit(dyn_slice, z, m)
    print(f"dyn_slice:  {t_dyn:.3f} ms", flush=True)

    x = jnp.asarray(rng.standard_normal((B, H, W, 1)).astype(np.float32))
    y = jnp.asarray((rng.random((B, H, W)) > 0.5).astype(np.int32))
    p = sample_params(jax.random.PRNGKey(0), B, "light")

    @jax.jit
    def warp(x, y, p):
        return _warp_batch_separable(x, y, p, H, W)

    t_warp = timeit(warp, x, y, p)
    print(f"full separable warp (light, b{B}): {t_warp:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
