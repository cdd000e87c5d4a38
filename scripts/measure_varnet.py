"""Measure one VarNet training step (fwd+bwd+AdamW) on the real TPU at the
vendored prostate protocol's shapes.

Vendored baseline (zip!DL_reconstruction/train_varnet_prostate.py): VarNet
num_cascades=10(12), sens_chans=8, chans=18, trained with PL-DDP on GPUs;
no published step time — this records ours for the perf story.

Run:  nohup python scripts/measure_varnet.py > /tmp/measure_varnet.log 2>&1 &
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mri_acl_imagesegmentation_adsp_tpu.utils.compile_cache import (
    enable_compilation_cache)
enable_compilation_cache()

from mri_acl_imagesegmentation_adsp_tpu.train.varnet_trainer import (
    VarNetArgs, VarNetTrainer)

C, A, H, W = 12, 3, 320, 320   # coils, averages, readout, phase


def main():
    rng = np.random.default_rng(0)
    args = VarNetArgs(out_dir="/tmp/varnet_bench", num_cascades=10,
                      sens_chans=8, chans=18, amp=True)
    tr = VarNetTrainer(args)
    k = jnp.asarray(rng.standard_normal((1, C, A, H, W, 2))
                    .astype(np.float32) * 0.1)
    e = jnp.asarray(rng.standard_normal((1, C, A, H, W, 2))
                    .astype(np.float32))
    t = jnp.asarray(rng.standard_normal((H, W)).astype(np.float32))[None]
    mv = jnp.asarray([1.0], jnp.float32)

    tr._init_if_needed(k, e)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(tr.params))
    print(f"params: {n_params/1e6:.2f} M", flush=True)

    p, o = tr.params, tr.opt_state
    p, o, loss = tr._train_step(p, o, k, e, t, mv)   # compile
    float(loss)
    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        p, o, loss = tr._train_step(p, o, k, e, t, mv)
    float(loss)
    t1 = time.perf_counter()
    print(f"train step ({C} coils, {A} aves, {H}x{W}, 10 cascades, bf16): "
          f"{(t1-t0)/reps*1e3:.1f} ms/step", flush=True)

    out = tr._fwd(p, k, e)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = tr._fwd(p, k, e)
    np.asarray(out)
    t1 = time.perf_counter()
    print(f"inference: {(t1-t0)/reps*1e3:.1f} ms/slice", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
