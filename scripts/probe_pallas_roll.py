"""Probe pltpu.roll throughput: can a VMEM-resident iterate-to-convergence
connected-components kernel beat the conv-based label propagation
(~87 ms/slice, ops/maskops.py)?

The candidate kernel's inner op is v = where(mask, max(v, 4-neighbor max),
v) — 4 rolls + 3 max + select per iteration, ~O(image diameter) iterations,
all in VMEM. This probe times N=128 such iterations on one 320x320 f32
image inside ONE pallas_call, vs the same loop as jnp ops under jit (XLA,
one HBM round-trip per iteration at worst).

Run:  nohup python scripts/probe_pallas_roll.py > /tmp/probe_roll.log 2>&1 &
"""
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mri_acl_imagesegmentation_adsp_tpu.utils.compile_cache import (
    enable_compilation_cache)
enable_compilation_cache()

H = W = 320
ITERS = 128


def _prop_kernel(m_ref, x_ref, o_ref):
    m = m_ref[:]

    def body(i, v):
        up = pltpu.roll(v, 1, 0)
        dn = pltpu.roll(v, -1, 0)
        lf = pltpu.roll(v, 1, 1)
        rt = pltpu.roll(v, -1, 1)
        nb = jnp.maximum(jnp.maximum(up, dn), jnp.maximum(lf, rt))
        return jnp.where(m > 0, jnp.maximum(v, nb), v)

    o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])


@jax.jit
def prop_pallas(mask, x):
    return pl.pallas_call(
        _prop_kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(mask, x)


@jax.jit
def prop_xla(mask, x):
    def body(i, v):
        nb = jnp.maximum(jnp.maximum(jnp.roll(v, 1, 0), jnp.roll(v, -1, 0)),
                         jnp.maximum(jnp.roll(v, 1, 1), jnp.roll(v, -1, 1)))
        return jnp.where(mask > 0, jnp.maximum(v, nb), v)
    return jax.lax.fori_loop(0, ITERS, body, x)


def timed(fn, *args, reps=8):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / reps


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    mask = (rng.random((H, W)) > 0.4).astype(np.float32)
    x = (np.arange(H * W, dtype=np.float32).reshape(H, W) + 1) * mask
    mask_j, x_j = jnp.asarray(mask), jnp.asarray(x)

    if mode in ("xla", "both"):
        t_x = timed(prop_xla, mask_j, x_j)
        print(f"XLA   : {t_x*1e3:8.2f} ms / {ITERS} iters "
              f"({t_x/ITERS*1e6:7.1f} us/iter)", flush=True)
    if mode in ("pallas", "both"):
        t_p = timed(prop_pallas, mask_j, x_j)
        print(f"pallas: {t_p*1e3:8.2f} ms / {ITERS} iters "
              f"({t_p/ITERS*1e6:7.1f} us/iter)", flush=True)
    if mode == "both":
        a = np.asarray(prop_xla(mask_j, x_j))
        b = np.asarray(prop_pallas(mask_j, x_j))
        print("match:", np.array_equal(a, b), flush=True)
