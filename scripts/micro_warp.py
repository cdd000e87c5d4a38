"""Microbench: separable-warp inner-loop formulations at train shapes.

The banded two-pass warp (train/augment.py:_warp_batch_separable) costs
~1.1 ms/step at batch 8 by trace attribution — the 2T+1-tap loop's f32
accumulator read-modify-write traffic dominates. All variants below
compute the SAME bilinear resample (only two taps per output are nonzero,
so every regrouping adds exact zeros and stays bit-identical in f32);
this measures which scheduling XLA maps best to the v5e.

  V0 loop-acc : current — per-tap f32 multiply-accumulate chain
  V1 two-tap  : floor/frac + chained one-hot selects for the lo/hi
                neighbors (bf16 payload domain), ONE f32 lerp at the end
  V2 stack-sum: stack the 2T+1 weighted terms, jnp.sum over the tap axis
  V3 einsum   : weights (B,L,N,J) x slices (J,B,L,N,C) multiply-reduce

Run:  nohup python scripts/micro_warp.py > /tmp/micro_warp.log 2>&1 &
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

from mri_acl_imagesegmentation_adsp_tpu.train import augment as aug

H = W = 320
T = 11          # light-recipe residual tap radius (see _warp_batch_separable)
PAD = 32


def _sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf[(0,) * leaf.ndim])


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    t1 = time.perf_counter()
    print(f"{name:34s} {(t1 - t0) / reps * 1e3:8.3f} ms", flush=True)
    return out


def shifted(zs, j, n, axis):
    if axis == 2:
        return zs[:, :, PAD + j: PAD + j + n, :]
    return zs[:, PAD + j: PAD + j + n, :, :]


def v0_loop(zs, rel, n, axis):
    idx_w = (lambda wj: wj[..., None]) if axis == 2 else \
        (lambda wj: jnp.swapaxes(wj, 1, 2)[..., None])
    out = None
    for j in range(-T, T + 1):
        wj = aug._hat(rel - j)
        term = idx_w(wj) * shifted(zs, j, n, axis).astype(jnp.float32)
        out = term if out is None else out + term
    return out.astype(jnp.bfloat16)


def v1_twotap(zs, rel, n, axis):
    fl = jnp.floor(rel).astype(jnp.int32)
    f = rel - fl
    bc = (lambda a: a[..., None]) if axis == 2 else \
        (lambda a: jnp.swapaxes(a, 1, 2)[..., None])
    lo = jnp.zeros_like(shifted(zs, 0, n, axis))
    hi = lo
    for j in range(-T, T + 1):
        sl = shifted(zs, j, n, axis)
        lo = jnp.where(bc(fl == j), sl, lo)
        hi = jnp.where(bc(fl == j - 1), sl, hi)
    f = bc(f)
    return ((1.0 - f) * lo.astype(jnp.float32)
            + f * hi.astype(jnp.float32)).astype(jnp.bfloat16)


def v2_stacksum(zs, rel, n, axis):
    idx_w = (lambda wj: wj[..., None]) if axis == 2 else \
        (lambda wj: jnp.swapaxes(wj, 1, 2)[..., None])
    terms = [idx_w(aug._hat(rel - j)) *
             shifted(zs, j, n, axis).astype(jnp.float32)
             for j in range(-T, T + 1)]
    return jnp.sum(jnp.stack(terms), axis=0).astype(jnp.bfloat16)


def v3_einsum(zs, rel, n, axis):
    js = jnp.arange(-T, T + 1, dtype=jnp.float32)
    wj = aug._hat(rel[..., None] - js)                     # (B, L, N, J)
    if axis != 2:
        wj = jnp.swapaxes(wj, 1, 2)
    sls = jnp.stack([shifted(zs, j, n, axis) for j in range(-T, T + 1)])
    return jnp.einsum("blnj,jblnc->blnc", wj,
                      sls.astype(jnp.float32)).astype(jnp.bfloat16)


def run(b):
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((b, H, W, 2)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    zp = jnp.pad(z, ((0, 0), (0, 0), (PAD, PAD), (0, 0)))
    # linear per-line residual positions, |rel| < T-1
    a = jnp.asarray(rng.uniform(-2, 2, (b, H, 1)).astype(np.float32))
    slope = jnp.asarray(rng.uniform(-0.05, 0.05, (b, H, 1)).astype(np.float32))
    rel = a + slope * jnp.arange(W, dtype=jnp.float32)[None, None, :]

    print(f"-- batch {b}, axis=2 pass --", flush=True)
    outs = {}
    for name, fn in [("V0 loop-acc", v0_loop), ("V1 two-tap", v1_twotap),
                     ("V2 stack-sum", v2_stacksum), ("V3 einsum", v3_einsum)]:
        outs[name] = timeit(name, jax.jit(fn, static_argnums=(2, 3)),
                            zp, rel, W, 2)
    ref = np.asarray(outs["V0 loop-acc"])
    for name, o in outs.items():
        same = np.array_equal(ref, np.asarray(o))
        print(f"   {name}: {'EXACT' if same else 'DIFFERS'}", flush=True)

    # full augment_batch for context
    x = jnp.asarray(rng.standard_normal((b, H, W, 1)).astype(np.float32))
    y = jnp.asarray((rng.uniform(size=(b, H, W)) > 0.5).astype(np.int32))
    key = jax.random.PRNGKey(0)
    timeit(f"augment_batch light b{b}",
           jax.jit(lambda x, y, k: aug.augment_batch(x, y, k, "light")),
           x, y, key)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    run(8)
    run(32)
