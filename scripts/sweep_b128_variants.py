"""Variant sweep at the tuned b128 train point (post warp rework,
base_b128 = 1089.7 slices/s): does scan_unroll / bf16 store / accum4
stack on top?

Run: nohup python scripts/sweep_b128_variants.py > /tmp/sweep_b128v.log 2>&1 &
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from mri_acl_imagesegmentation_adsp_tpu.utils.compile_cache import (
    enable_compilation_cache)

enable_compilation_cache()

import jax
import jax.numpy as jnp

from mri_acl_imagesegmentation_adsp_tpu.data.hbm_loader import (
    SliceStore, epoch_permutation)
from mri_acl_imagesegmentation_adsp_tpu.models import build_unet
from mri_acl_imagesegmentation_adsp_tpu.train.engine import (
    Engine, make_optimizer)
from mri_acl_imagesegmentation_adsp_tpu.train.losses import LossManager

H = W = 320
N = 512
BATCH = 128


def make_store(dtype="float32"):
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((N, H, W)).astype(np.float32)
    yy, xx = np.mgrid[:H, :W]
    msks = np.stack([((yy - H // 2) ** 2 + (xx - W // 2) ** 2 <
                      (80 + (i % 40)) ** 2) for i in range(N)]).astype(np.int32)
    s = SliceStore(images=imgs, masks=msks, vol_starts=np.asarray([0]),
                   vol_sizes=np.asarray([N]), files=["bench"])
    return s.to_device(k=1, image_dtype=jnp.bfloat16
                       if dtype == "bfloat16" else jnp.float32)


def measure(engine, store, reps=4):
    state = engine.init_state(jax.random.PRNGKey(0),
                              jnp.zeros((1, H, W, 1), jnp.float32))
    perm = epoch_permutation(jax.random.PRNGKey(1), N, BATCH)
    steps = perm.shape[0]
    state, _, _ = engine.train_one_epoch(state, store, perm,
                                         jax.random.PRNGKey(2), dataset_len=N)
    t0 = time.perf_counter()
    all_losses = []
    for r in range(reps):
        state, losses = engine.train_one_epoch_async(
            state, store, perm, jax.random.PRNGKey(3 + r))
        all_losses.append(losses)
    engine.check_epoch_losses(np.stack([np.asarray(l) for l in all_losses]),
                              state)
    dt = time.perf_counter() - t0
    return reps * steps * BATCH / dt, dt / (reps * steps) * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    store = make_store()
    model = build_unet("unet", "resnet34", "none", in_ch=1, classes=1,
                       dtype=jnp.bfloat16)
    loss = LossManager(classes=1, name="dice_bce")
    opt = lambda: make_optimizer(1e-3, 1e-4, 5.0)

    cases = {
        "base": (Engine(model, loss, opt(), classes=1, aug="light"), store),
        "unroll2": (Engine(model, loss, opt(), classes=1, aug="light",
                           scan_unroll=2), store),
        "accum4": (Engine(model, loss, opt(), classes=1, aug="light",
                          accum_steps=4), store),
    }
    for name, (eng, st) in cases.items():
        rate, ms = measure(eng, st)
        print(f"{name}_b128: {rate:.1f} slices/s ({ms:.2f} ms/step)",
              flush=True)
    store16 = make_store("bfloat16")
    eng = Engine(model, loss, opt(), classes=1, aug="light")
    rate, ms = measure(eng, store16)
    print(f"store16_b128: {rate:.1f} slices/s ({ms:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
