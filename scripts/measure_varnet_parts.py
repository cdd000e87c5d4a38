"""Decompose the VarNet train step's 165 ms into its component costs.

The r2/r3 traces are FLAT (no op >0.3%), so instead of per-op attribution
this measures each architectural stage in isolation at protocol shapes
(batch 1, 12 coils, 3 aves, 320^2, 10 cascades, chans 18, bf16 AMP):

  A. the DFT ladder alone: 10x (sens_reduce -> sens_expand) fwd
  B. one NormUnet(18, 4 pools) fwd / fwd+bwd on the (1,1,3,320,320,2) reg
     input, and the same x10
  C. SensitivityModel fwd (NormUnet over 12 coils / RSS)
  D. full VarNet fwd, and the full train step (reference number)

Each stage is jitted standalone with a data dependence chain to defeat CSE.

Run: nohup python scripts/measure_varnet_parts.py > /tmp/varnet_parts.log 2>&1 &
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

from mri_acl_imagesegmentation_adsp_tpu.recon.varnet import (
    NormUnet, SensitivityModel, VarNet, sens_expand, sens_reduce)

C, A, H, W = 12, 3, 320, 320
CASCADES = 10


def timeit(name, fn, *args, reps=8):
    out = fn(*args)
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf[(0,) * leaf.ndim])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf[(0,) * leaf.ndim])
    t1 = time.perf_counter()
    print(f"{name:44s} {(t1 - t0) / reps * 1e3:8.2f} ms", flush=True)
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((1, C, A, H, W, 2))
                    .astype(np.float32) * 0.1)
    sens = jnp.asarray(rng.standard_normal((1, C, A, H, W, 2))
                       .astype(np.float32) * 0.1)

    # A. DFT ladder: 10 cascades of sens_reduce + sens_expand, no U-Net
    @jax.jit
    def dft_ladder(kk, ss):
        for i in range(CASCADES):
            img = sens_reduce(kk, ss)              # ifft + coil combine
            kk = kk - 0.1 * sens_expand(img, ss)   # fft + coil expand
        return kk

    timeit(f"A. DFT ladder x{CASCADES} (ifft+fft+coil ops)", dft_ladder, k, sens)

    # B. NormUnet regularizer
    reg_in = jnp.asarray(rng.standard_normal((1, 1, A, H, W, 2))
                         .astype(np.float32))
    nu = NormUnet(chans=18, num_pools=4, dtype=jnp.bfloat16)
    nv = nu.init(jax.random.PRNGKey(0), reg_in)

    timeit("B. NormUnet(18,4) fwd x1",
           jax.jit(lambda v, x: nu.apply(v, x)), nv, reg_in)

    @jax.jit
    def nu10(v, x):
        for i in range(CASCADES):
            x = x - 0.1 * nu.apply(v, x)
        return x
    timeit(f"B. NormUnet fwd x{CASCADES} (chained)", nu10, nv, reg_in)

    @jax.jit
    def nu10_grad(v, x):
        def loss(v):
            y = x
            for i in range(CASCADES):
                y = y - 0.1 * nu.apply(v, y)
            return jnp.mean(jnp.abs(y))
        return jax.grad(loss)(v)
    timeit(f"B. NormUnet fwd+bwd x{CASCADES}", nu10_grad, nv, reg_in)

    # C. sensitivity model
    sm = SensitivityModel(chans=8, num_pools=4, dtype=jnp.bfloat16)
    sv = sm.init(jax.random.PRNGKey(0), sens)
    timeit("C. SensitivityModel fwd", jax.jit(lambda v, e: sm.apply(v, e)),
           sv, sens)

    @jax.jit
    def sm_grad(v, e):
        return jax.grad(
            lambda v: jnp.mean(jnp.abs(sm.apply(v, e))))(v)
    timeit("C. SensitivityModel fwd+bwd", sm_grad, sv, sens)

    # D. full model
    vn = VarNet(num_cascades=CASCADES, sens_chans=8, chans=18,
                dtype=jnp.bfloat16)
    vv = vn.init(jax.random.PRNGKey(0), k, sens)
    timeit("D. VarNet fwd", jax.jit(lambda v, kk, e: vn.apply(v, kk, e)),
           vv, k, sens)

    @jax.jit
    def vn_grad(v, kk, e):
        return jax.grad(
            lambda v: jnp.mean(jnp.abs(vn.apply(v, kk, e))))(v)
    timeit("D. VarNet fwd+bwd", vn_grad, vv, k, sens)


if __name__ == "__main__":
    main()
