"""Measure the epoch-scan train throughput with optax.flatten vs the
per-leaf optimizer layout (reference config: batch 8, 320^2, bf16, light
aug; plus the tuned batch-32 variant).

Hypothesis (b8 trace): hundreds of small per-leaf update ops + loop-carried
buffers inside the epoch scan cost more than one concatenated-vector
update. Elementwise AdamW math is identical; global-norm sum order changes
at f32-rounding level.

RESULT (v5e, 2026-08-17): flatten LOSES — b8 710.0 -> 599.8 slices/s,
b32 787.3 -> 741.6. The ravel/concat relayout of every leaf costs more
than the per-leaf fusions it removes; engine.make_optimizer stays
per-leaf (its docstring records this measurement).

Run:  nohup python scripts/measure_flat_opt.py > /tmp/flat_opt.log 2>&1 &
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

from mri_acl_imagesegmentation_adsp_tpu.data.hbm_loader import (
    SliceStore, epoch_permutation)
from mri_acl_imagesegmentation_adsp_tpu.models import build_unet
from mri_acl_imagesegmentation_adsp_tpu.train.engine import Engine
from mri_acl_imagesegmentation_adsp_tpu.train.losses import LossManager

H = W = 320
N = 256


def make_opt(flat: bool):
    """Engine's production optimizer, optionally optax.flatten-wrapped
    (the flat variant lives only here now — it measured slower)."""
    import optax

    def make(learning_rate):
        tx = optax.chain(optax.clip_by_global_norm(5.0),
                         optax.adamw(learning_rate, weight_decay=1e-4))
        return optax.flatten(tx) if flat else tx
    return optax.inject_hyperparams(make)(learning_rate=1e-3)


def bench(flat: bool, batch: int, aug: str = "light") -> float:
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((N, H, W)).astype(np.float32)
    yy, xx = np.mgrid[:H, :W]
    msks = np.stack([((yy - H // 2) ** 2 + (xx - W // 2) ** 2 <
                      (80 + (i % 40)) ** 2) for i in range(N)]).astype(np.int32)
    store = SliceStore(images=imgs, masks=msks, vol_starts=np.asarray([0]),
                       vol_sizes=np.asarray([N]), files=["bench"]).to_device(k=1)
    model = build_unet("unet", "resnet34", "none", in_ch=1, classes=1,
                       dtype=jnp.bfloat16)
    engine = Engine(model, LossManager(classes=1, name="dice_bce"),
                    make_opt(flat), classes=1, aug=aug)
    state = engine.init_state(jax.random.PRNGKey(0),
                              jnp.zeros((1, H, W, 1), jnp.float32))
    perm = epoch_permutation(jax.random.PRNGKey(1), N, batch)
    steps = perm.shape[0]
    state, losses, _ = engine.train_one_epoch(
        state, store, perm, jax.random.PRNGKey(2), dataset_len=N)  # compile
    reps = 6
    t0 = time.perf_counter()
    all_losses = []
    for r in range(reps):
        state, losses = engine.train_one_epoch_async(
            state, store, perm, jax.random.PRNGKey(3 + r))
        all_losses.append(losses)
    engine.check_epoch_losses(
        np.stack([np.asarray(l) for l in all_losses]), state)
    rate = reps * steps * batch / (time.perf_counter() - t0)
    print(f"flat={flat} batch={batch} aug={aug}: {rate:8.1f} slices/s",
          flush=True)
    return rate


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for batch in (8, 32):
        for flat in (False, True):
            bench(flat, batch)
