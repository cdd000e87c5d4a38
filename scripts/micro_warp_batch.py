"""Attribute the separable warp's super-linear cost at large batch.

aug_none_b128 measured 104.36 ms/step vs base_b128 125.90 — augmentation
costs 21.5 ms/step at b128 where the b8 delta (0.8 ms) extrapolates to
~12.5. Hypothesis: XLA stops fusing the 27-tap accumulation loop at large
shapes and materializes per-tap f32 terms. Measures, standalone:

  warp_b8 / b32 / b128 : _warp_batch_separable, light cfg  (linearity)
  warp_b128_chunk8     : same wrapped in a lax.scan over 16 b8 chunks
  flips_b128           : flip+where gates only (the non-warp aug cost)

Run: nohup python scripts/micro_warp_batch.py > /tmp/micro_warp_batch.log 2>&1 &
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from mri_acl_imagesegmentation_adsp_tpu.utils.compile_cache import (
    enable_compilation_cache)
enable_compilation_cache()

import jax
import jax.numpy as jnp

from mri_acl_imagesegmentation_adsp_tpu.train.augment import (
    _RECIPES, _warp_batch_separable, augment_batch, sample_params)

H = W = 320


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    float(jnp.sum(jax.tree.leaves(out)[0][..., :1, :1]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0][..., :1, :1]))
    return (time.perf_counter() - t0) / n * 1e3


def data(b, rng):
    x = jnp.asarray(rng.standard_normal((b, H, W, 1)).astype(np.float32))
    y = jnp.asarray((rng.random((b, H, W)) > 0.5).astype(np.int32))
    p = sample_params(jax.random.PRNGKey(0), b, "light")
    return x, y, p


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    cfg = _RECIPES["light"]

    @jax.jit
    def warp(x, y, p):
        return _warp_batch_separable(x, y, p, H, W, cfg=cfg)

    for b in (8, 32, 128):
        x, y, p = data(b, rng)
        ms = timeit(warp, x, y, p)
        print(f"warp_b{b}: {ms:.3f} ms  ({ms / b * 1e3:.1f} us/slice)",
              flush=True)

    # chunked: scan over 16 chunks of 8
    x, y, p = data(128, rng)
    @jax.jit
    def warp_chunked(x, y, p):
        xc = x.reshape(16, 8, H, W, 1)
        yc = y.reshape(16, 8, H, W)
        pc = jax.tree.map(lambda a: a.reshape(16, 8), p)
        def body(_, args):
            xo, yo = _warp_batch_separable(*args[:2], args[2], H, W, cfg=cfg)
            return None, (xo, yo)
        _, (xo, yo) = jax.lax.scan(body, None, (xc, yc, pc))
        return xo.reshape(128, H, W, 1), yo.reshape(128, H, W)
    ms = timeit(warp_chunked, x, y, p)
    print(f"warp_b128_chunk8: {ms:.3f} ms", flush=True)

    @jax.jit
    def flips(x, y, p):
        x = jnp.where(p.hflip[:, None, None, None], x[:, :, ::-1, :], x)
        y = jnp.where(p.hflip[:, None, None], y[:, :, ::-1], y)
        gate = p.apply_ssr
        return (jnp.where(gate[:, None, None, None], x * 1.0, x),
                jnp.where(gate[:, None, None], y, y))
    ms = timeit(flips, x, y, p)
    print(f"flips_b128: {ms:.3f} ms", flush=True)

    @jax.jit
    def full_aug(x, y, key):
        return augment_batch(x, y, key, "light")
    ms = timeit(full_aug, x, y, jax.random.PRNGKey(1))
    print(f"augment_batch_b128 (light): {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
