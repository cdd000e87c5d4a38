"""Measure the segmentation decoder's phase-internal channel threshold.

The VarNet microbench (micro_cascade_conv.py) measured the dense phase
conv LOSING at 72 channels (4x FLOPs vs only 2x lane utilization once
channels reach 64+); unet2d's _PHASE_INTERNAL_MAX_CH = 64 predates that
crossover measurement, so the 64-feature decoder block may be a hidden
loss inside the aggregate win from the 16/32 blocks. Times the b8/b32
train step and b32 inference at thresholds 64 (current) vs 32.

Run:  nohup python scripts/measure_phase_threshold.py > /tmp/phase_thr.log 2>&1 &
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
from mri_acl_imagesegmentation_adsp_tpu.models import unet2d as u2
from mri_acl_imagesegmentation_adsp_tpu.train.engine import (
    Engine, make_optimizer)
from mri_acl_imagesegmentation_adsp_tpu.train.losses import LossManager

H = W = 320
N = 256


def bench_train(batch: int) -> float:
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((N, H, W)).astype(np.float32)
    yy, xx = np.mgrid[:H, :W]
    msks = np.stack([((yy - H // 2) ** 2 + (xx - W // 2) ** 2 <
                      (80 + (i % 40)) ** 2) for i in range(N)]).astype(np.int32)
    store = SliceStore(images=imgs, masks=msks, vol_starts=np.asarray([0]),
                       vol_sizes=np.asarray([N]), files=["x"]).to_device(k=1)
    model = build_unet("unet", "resnet34", "none", in_ch=1, classes=1,
                       dtype=jnp.bfloat16)
    engine = Engine(model, LossManager(classes=1, name="dice_bce"),
                    make_optimizer(1e-3, 1e-4, 5.0), classes=1, aug="light")
    state = engine.init_state(jax.random.PRNGKey(0),
                              jnp.zeros((1, H, W, 1), jnp.float32))
    perm = epoch_permutation(jax.random.PRNGKey(1), N, batch)
    steps = perm.shape[0]
    state, _, _ = engine.train_one_epoch(
        state, store, perm, jax.random.PRNGKey(2), dataset_len=N)
    reps = 6
    t0 = time.perf_counter()
    ls = []
    for r in range(reps):
        state, losses = engine.train_one_epoch_async(
            state, store, perm, jax.random.PRNGKey(3 + r))
        ls.append(losses)
    engine.check_epoch_losses(np.stack([np.asarray(l) for l in ls]), state)
    return reps * steps * batch / (time.perf_counter() - t0)


def bench_infer(batch: int = 256, scan_steps: int = 4) -> float:
    from functools import partial
    model = build_unet("unet", "resnet34", "none", in_ch=1, classes=1,
                       dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x_all = jnp.asarray(rng.standard_normal(
        (scan_steps, batch, H, W, 1)).astype(np.float32))
    v = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(0),
                                                  x_all[0, :1])
    params, bs = v["params"], v.get("batch_stats", {})

    @jax.jit
    def infer_all(params, bs, xs):
        def body(_, xb):
            return None, jax.nn.sigmoid(model.apply(
                {"params": params, "batch_stats": bs}, xb, train=False))
        return jax.lax.scan(body, None, xs)[1]

    probs = infer_all(params, bs, x_all)
    probs.block_until_ready()
    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        probs = infer_all(params, bs, x_all)
    probs.block_until_ready()
    return reps * scan_steps * batch / (time.perf_counter() - t0)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for thr in (64, 32):
        u2._DecoderBlock._PHASE_INTERNAL_MAX_CH = thr
        print(f"-- threshold {thr} --", flush=True)
        print(f"  train b8 : {bench_train(8):8.1f} slices/s", flush=True)
        print(f"  train b32: {bench_train(32):8.1f} slices/s", flush=True)
        print(f"  infer b256: {bench_infer():8.1f} slices/s", flush=True)
