"""Pinpoint where the composed phase-space decoder loses its micro-op wins.

Times each glue op device-only (chained fori_loop): the pad+VALID+4-slice
+concat epilogue of apply_phase_conv vs the bare conv, space_to_depth /
depth_to_space transposes, and the (B,L,L,4C)->(B,L,L,4,C) BN reshape.

Run:  nohup python scripts/micro_glue.py > /tmp/micro_glue.log 2>&1 &
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

from mri_acl_imagesegmentation_adsp_tpu.models.phaseconv import (
    apply_phase_conv, depth_to_space, space_to_depth)

B = 32
DT = jnp.bfloat16


def timed_chain(fn, *args, iters=16, inner=8):
    @jax.jit
    def run(*a):
        def body(i, acc):
            y = fn(a[0] + acc * jnp.bfloat16(1e-8), *a[1:])
            return jnp.mean(y).astype(DT)
        return lax.fori_loop(0, inner, body, jnp.bfloat16(0))

    np.asarray(run(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / (iters * inner)


def main():
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)

    # block5 dense conv2 shapes: 4C=64 @160^2
    x = jnp.asarray(rng.standard_normal((B, 160, 160, 64)), DT)
    w22 = jnp.asarray(rng.standard_normal((2, 2, 64, 64)) * 0.05, DT)

    t_bare = timed_chain(lambda t: lax.conv_general_dilated(
        t, w22, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(DT), x)
    print(f"bare conv2x2 SAME 64->64 @160^2 : {t_bare*1e3:7.3f} ms",
          flush=True)

    t_full = timed_chain(lambda t: apply_phase_conv(t, w22, DT), x)
    print(f"apply_phase_conv (pad+4slice)   : {t_full*1e3:7.3f} ms",
          flush=True)

    # s2d / d2s of a 160^2 x 64 tensor
    x_hi = jnp.asarray(rng.standard_normal((B, 160, 160, 64)), DT)
    t_s2d = timed_chain(space_to_depth, x_hi)
    print(f"space_to_depth 64ch 160->80     : {t_s2d*1e3:7.3f} ms",
          flush=True)
    x_ph = jnp.asarray(rng.standard_normal((B, 80, 80, 256)), DT)
    t_d2s = timed_chain(depth_to_space, x_ph)
    print(f"depth_to_space 256ch 80->160    : {t_d2s*1e3:7.3f} ms",
          flush=True)

    # BN reshape split of the lane axis: (B,160,160,64)->(...,4,16)->ops->back
    sc = jnp.asarray(rng.standard_normal((16,)), DT)

    def bn_reshape(t):
        b, h, w, f = t.shape
        y = t.reshape(b, h, w, 4, f // 4)
        y = y * sc + jnp.bfloat16(0.1)
        y = jnp.maximum(y, 0)
        return y.reshape(b, h, w, f)

    t_bnr = timed_chain(bn_reshape, x)
    print(f"BN reshape(4,16)+mul+relu       : {t_bnr*1e3:7.3f} ms",
          flush=True)

    # same BN math with tiled params, NO reshape
    sc4 = jnp.tile(sc, 4)

    def bn_flat(t):
        return jnp.maximum(t * sc4 + jnp.bfloat16(0.1), 0)

    t_bnf = timed_chain(bn_flat, x)
    print(f"BN tiled-params flat            : {t_bnf*1e3:7.3f} ms",
          flush=True)

    # epilogue-free alternative: 3x3 SAME conv with phase-embedded kernel
    w33 = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05, DT)
    t_33 = timed_chain(lambda t: lax.conv_general_dilated(
        t, w33, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(DT), x)
    print(f"conv3x3 SAME 64->64 @160^2      : {t_33*1e3:7.3f} ms "
          f"(epilogue-free dense alternative)", flush=True)

    # up-conv epilogue-free: conv3x3 SAME 32->64 @160^2
    x32 = jnp.asarray(rng.standard_normal((B, 160, 160, 32)), DT)
    w334 = jnp.asarray(rng.standard_normal((3, 3, 32, 64)) * 0.05, DT)
    t_up33 = timed_chain(lambda t: lax.conv_general_dilated(
        t, w334, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(DT), x32)
    print(f"conv3x3 SAME 32->64 @160^2      : {t_up33*1e3:7.3f} ms "
          f"(epilogue-free up-conv alternative)", flush=True)


if __name__ == "__main__":
    main()
