"""Micro-benchmark: high-res low-channel decoder convs vs phase-space.

Hypothesis (from profile_unet.py): the decoder costs ~70% of inference
device time at ~6% MFU because its convs have 16-32 output channels (7/8
of the MXU's 128 output lanes idle) at large spatial sizes. A 3x3 conv at
HxW on C channels is mathematically a 2x2-support conv at (H/2)x(W/2) on
the 4-phase space-to-depth representation (4C channels) — 1.78x the FLOPs
as a dense 2x2x4Cx4C kernel, but with MXU-shaped operands.

Also measures the upsample-conv: nearest-up-2x + conv3x3 vs computing the
four output phases directly from the low-res input (2x2 kernels, 2.25x
FEWER FLOPs, no materialized 4x tensor).

All timings are device-only (chained fori_loop inside one jit dispatch).

Run:  nohup python scripts/micro_decoder.py > /tmp/micro_decoder.log 2>&1 &
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

from mri_acl_imagesegmentation_adsp_tpu.utils.compile_cache import (
    enable_compilation_cache)
enable_compilation_cache()

B = 32
DT = jnp.bfloat16


def conv(x, w, stride=1, padding="SAME"):
    return lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(DT)


def timed_chain(fn, x, iters=24, inner=8):
    """Device-only time of fn via inner-chained fori_loop in one jit."""
    @jax.jit
    def run(x):
        def body(i, acc):
            y = fn(x + acc * jnp.bfloat16(1e-8))
            return jnp.mean(y).astype(DT)
        return lax.fori_loop(0, inner, body, jnp.bfloat16(0))

    np.asarray(run(x))  # compile + correctness surface
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(x)
    np.asarray(out)
    return (time.perf_counter() - t0) / (iters * inner)


def main():
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)

    cases = []

    # --- block5 conv2: conv3x3 16->16 @320^2  vs phase conv2x2 64->64 @160^2
    for C, H in ((16, 320), (32, 160)):
        x_hi = jnp.asarray(rng.standard_normal((B, H, H, C)), DT)
        w_hi = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, DT)
        t_hi = timed_chain(lambda x: conv(x, w_hi), x_hi)

        x_ph = jnp.asarray(
            rng.standard_normal((B, H // 2, H // 2, 4 * C)), DT)
        w_ph = jnp.asarray(
            rng.standard_normal((2, 2, 4 * C, 4 * C)) * 0.05, DT)
        t_ph = timed_chain(lambda x: conv(x, w_ph), x_ph)
        cases.append((f"conv3x3 {C}ch @{H}^2", t_hi,
                      f"phase conv2x2 {4*C}ch @{H//2}^2", t_ph))

    # --- block5 conv1: up2 + conv3x3 32->16 @320^2
    #     vs 4-phase direct: conv3x3 32->64 @160^2 (phase-embedded taps)
    C_in, C_out, Hl = 32, 16, 160
    x_lo = jnp.asarray(rng.standard_normal((B, Hl, Hl, C_in)), DT)
    w1 = jnp.asarray(rng.standard_normal((3, 3, C_in, C_out)) * 0.05, DT)

    def up_conv(x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return conv(x, w1)

    t_up = timed_chain(up_conv, x_lo)

    w_ph4 = jnp.asarray(
        rng.standard_normal((2, 2, C_in, 4 * C_out)) * 0.05, DT)

    def phase_conv(x):
        # 2x2 kernel, SAME-low padding; output (H/2, W/2, 4*C_out)
        return conv(x, w_ph4)

    t_phc = timed_chain(phase_conv, x_lo)
    cases.append((f"up2+conv3x3 {C_in}->{C_out} @{2*Hl}^2", t_up,
                  f"phase conv2x2 {C_in}->{4*C_out} @{Hl}^2", t_phc))

    # --- block4 conv1 skip part: conv3x3 64->32 @160^2
    #     vs s2d(skip) phase: conv2x2 256->128 @80^2
    x_sk = jnp.asarray(rng.standard_normal((B, 160, 160, 64)), DT)
    w_sk = jnp.asarray(rng.standard_normal((3, 3, 64, 32)) * 0.05, DT)
    t_sk = timed_chain(lambda x: conv(x, w_sk), x_sk)
    x_sp = jnp.asarray(rng.standard_normal((B, 80, 80, 256)), DT)
    w_sp = jnp.asarray(rng.standard_normal((2, 2, 256, 128)) * 0.05, DT)
    t_sp = timed_chain(lambda x: conv(x, w_sp), x_sp)
    cases.append(("conv3x3 64->32 @160^2", t_sk,
                  "phase conv2x2 256->128 @80^2", t_sp))

    # --- nearest-up cost alone (HBM traffic of materializing 4x)
    x16 = jnp.asarray(rng.standard_normal((B, 160, 160, 32)), DT)
    t_rep = timed_chain(
        lambda x: jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2), x16)
    print(f"nearest-up2x 32ch 160->320: {t_rep*1e3:7.3f} ms", flush=True)

    print()
    for a, ta, b, tb in cases:
        print(f"{a:36s} {ta*1e3:7.3f} ms | {b:36s} {tb*1e3:7.3f} ms "
              f"| speedup {ta/tb:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
