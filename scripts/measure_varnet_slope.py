"""Split the VarNet train step into fixed cost (sens model + loss + opt)
vs per-cascade cost by measuring at 1, 4, and 10 cascades.

Run: nohup python scripts/measure_varnet_slope.py > /tmp/varnet_slope.log 2>&1 &
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

from mri_acl_imagesegmentation_adsp_tpu.train.varnet_trainer import (
    VarNetArgs, VarNetTrainer)

C, A, H, W = 12, 3, 320, 320


def step_ms(n_casc: int) -> float:
    rng = np.random.default_rng(0)
    args = VarNetArgs(out_dir=f"/tmp/varnet_slope_{n_casc}",
                      num_cascades=n_casc, sens_chans=8, chans=18, amp=True)
    tr = VarNetTrainer(args)
    k = jnp.asarray(rng.standard_normal((1, C, A, H, W, 2))
                    .astype(np.float32) * 0.1)
    e = jnp.asarray(rng.standard_normal((1, C, A, H, W, 2))
                    .astype(np.float32))
    t = jnp.asarray(rng.standard_normal((H, W)).astype(np.float32))[None]
    mv = jnp.asarray([1.0], jnp.float32)
    tr._init_if_needed(k, e)
    p, o = tr.params, tr.opt_state
    p, o, loss = tr._train_step(p, o, k, e, t, mv)
    float(loss)
    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        p, o, loss = tr._train_step(p, o, k, e, t, mv)
    float(loss)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"cascades={n_casc:2d}: {ms:7.1f} ms/step", flush=True)
    return ms


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    m1 = step_ms(1)
    m4 = step_ms(4)
    m10 = step_ms(10)
    slope = (m10 - m1) / 9
    print(f"per-cascade {slope:.1f} ms; fixed {m1 - slope:.1f} ms", flush=True)
