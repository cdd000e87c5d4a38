"""Microbench: component-size computation for remove_small_objects at
640x368, batched over 36 slices — jnp.bincount scatter-add vs top-K-roots
compare-reduce (K static) vs raw pieces.

Run:  nohup python scripts/micro_bincount.py > /tmp/micro_bincount.log 2>&1 &
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
from jax import lax

from mri_acl_imagesegmentation_adsp_tpu.ops.maskops import label_components

S, H, W = 36, 640, 368
K = 128


def _sync(out):
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
    print(f"{name:36s} {ms:8.1f} ms/vol  {ms/S:6.2f} ms/slice", flush=True)
    return out


def keep_bincount(lbl, m):
    counts = jnp.bincount(lbl.ravel(), length=H * W + 1)
    return jnp.logical_and(m, counts[lbl] >= 256)


def keep_topk_roots(lbl, m):
    """Component sizes via K smallest root labels + compare-reduce.

    Roots are pixels whose label equals their own linear index; real
    post-morphology masks have << K components. Returns (keep, ok) where
    ok certifies the root count fit in K."""
    flat = lbl.ravel()
    iota = jnp.arange(H * W, dtype=jnp.int32)
    is_root = (flat == iota) & (flat < H * W)
    n_roots = jnp.sum(is_root)
    ok = n_roots <= K
    # K smallest root labels: top_k of negated (masked) values
    masked = jnp.where(is_root, flat, jnp.int32(2 * H * W))
    neg_top, _ = lax.top_k(-masked, K)
    roots = -neg_top                                  # (K,) ascending roots
    eq = flat[None, :] == roots[:, None]              # (K, H*W)
    counts = jnp.sum(eq.astype(jnp.int32), axis=1)    # (K,)
    small = (counts < 256) & (roots < H * W)
    # pixel is removed iff its label matches a small root
    rm = jnp.any(eq & small[:, None], axis=0).reshape(H, W)
    return jnp.logical_and(m, ~rm), ok


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    m_np = np.zeros((S, H, W), bool)
    m_np[:, 100:540, 60:310] = True
    # poke holes + add small blobs so there are multiple components
    for s in range(S):
        for _ in range(30):
            cy, cx = rng.integers(0, H), rng.integers(0, W)
            m_np[s, cy:cy + 6, cx:cx + 6] ^= True
    m = jnp.asarray(m_np)

    lbl = jax.jit(jax.vmap(lambda mm: label_components(mm, sweeps=4)))(m)
    _sync(lbl)

    timeit("bincount+keep (scatter)",
           jax.jit(jax.vmap(keep_bincount)), lbl, m)
    out = timeit(f"topk-roots K={K} (compare-reduce)",
                 jax.jit(jax.vmap(keep_topk_roots)), lbl, m)
    keep_a = np.asarray(jax.jit(jax.vmap(keep_bincount))(lbl, m))
    keep_b, ok = map(np.asarray, out)
    assert ok.all(), "root overflow in microbench fixture"
    assert (keep_a == keep_b).all(), "keep mismatch!"
    print("outputs identical, all certified", flush=True)


if __name__ == "__main__":
    main()
