"""Microbench: formulations of the VarNet cascade U-Net's dominant convs.

The r3 HLO dump (dump_hlo_varnet.py) shows ~3.7 GB/step of copy/transpose
ops around the cascade convs: at 18-72 channels XLA repacks activations to
fill the 128-lane tile around EVERY conv. Candidates on the dominant
shapes (b=1, 320^2 and 160^2, bf16):

  V0 nhwc      : plain NHWC conv3x3 (current)
  V1 phase     : dense-embedded conv3x3 on the phase-major tensor
                 (160^2, 4C) -> same math, 4x channels, 1/4 spatial
  V2 pad128    : channel-pad input+kernel to 128 lanes, slice back

Chained x16 per dispatch to drown the relay dispatch tax.

Run:  nohup python scripts/micro_cascade_conv.py > /tmp/micro_casconv.log 2>&1 &
"""
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

from mri_acl_imagesegmentation_adsp_tpu.utils.compile_cache import (
    enable_compilation_cache)
enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax import lax

from mri_acl_imagesegmentation_adsp_tpu.models.phaseconv import (
    dense_embedded_kernel, space_to_depth)

DN = ("NHWC", "HWIO", "NHWC")


def timeit(name, fn, *args, reps=8):
    out = fn(*args)
    np.asarray(out[(0,) * out.ndim])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out[(0,) * out.ndim])
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:44s} {ms:8.3f} ms/dispatch", flush=True)
    return ms


def chain16(conv):
    def run(x, w):
        def body(i, acc):
            return conv(acc, w)
        return lax.fori_loop(0, 16, body, x)
    return jax.jit(run)


def bench(h, c):
    print(f"-- conv3x3 {c}->{c} @ {h}x{h}, b=1, bf16, x16 chained --",
          flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, h, h, c)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.bfloat16)

    v0 = chain16(lambda x, w: lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=DN))
    timeit("V0 nhwc", v0, x, k)

    xp = space_to_depth(x)
    kp = dense_embedded_kernel(k)
    v1 = chain16(lambda x, w: lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=DN))
    timeit("V1 phase-major (4x chans, 1/4 spatial)", v1, xp, kp)

    pad = 128 - c
    xpad = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad)))
    kpad = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, pad)))
    v2 = chain16(lambda x, w: lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=DN))
    timeit("V2 pad-to-128 lanes", v2, xpad, kpad)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    bench(320, 18)
    bench(160, 36)
    bench(160, 72)
