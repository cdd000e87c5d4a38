"""Per-sample VarNet train-step cost vs batch size (fixed-cost
amortization: sens model + loss + AdamW ~28 ms of the 87 ms b=1 step).

Run:  nohup python scripts/measure_varnet_batch.py > /tmp/varnet_batch.log 2>&1 &
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


def step_ms(b: int) -> float:
    rng = np.random.default_rng(0)
    args = VarNetArgs(out_dir=f"/tmp/varnet_b{b}", num_cascades=10,
                      sens_chans=8, chans=18, amp=True, batch_size=b)
    tr = VarNetTrainer(args)
    k = jnp.asarray(rng.standard_normal((b, C, A, H, W, 2))
                    .astype(np.float32) * 0.1)
    e = jnp.asarray(rng.standard_normal((b, C, A, H, W, 2))
                    .astype(np.float32))
    t = jnp.asarray(rng.standard_normal((b, H, W)).astype(np.float32))
    mv = jnp.ones((b,), jnp.float32)
    tr._init_if_needed(k[:1], e[:1])
    p, o = tr.params, tr.opt_state
    p, o, loss = tr._train_step(p, o, k, e, t, mv)
    float(loss)
    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        p, o, loss = tr._train_step(p, o, k, e, t, mv)
    float(loss)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"batch={b}: {ms:7.1f} ms/step = {ms/b:6.1f} ms/sample",
          flush=True)
    return ms


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for b in (1, 2, 4):
        step_ms(b)
