"""r5 MFU sweep at the tuned b128 train point (VERDICT r4 #3).

Levers this round:
  * remat at b128/b256 — at b8/b32 remat LOSES (recompute > HBM saving,
    r4c sweep), but b256 regressed past the HBM working-set knee, so
    shrinking saved activations may move the knee and unlock the larger
    M dim;
  * phase-internal decoder threshold 64 during TRAINING — the 32 crossover
    was measured on b256 INFERENCE; the backward of a 64-channel
    phase-internal block trades 4x-FLOP dense-embedded convs for
    less activation traffic, which may win where the step is
    traffic-bound;
  * b256 re-measured post warp-rework (r4c's 941 predates the rank-1 tap
    weights).

Run: nohup python scripts/sweep_b128_r5.py > /tmp/sweep_b128_r5.log 2>&1 &
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
from mri_acl_imagesegmentation_adsp_tpu.models import unet2d as _u2
from mri_acl_imagesegmentation_adsp_tpu.train.engine import (
    Engine, make_optimizer)
from mri_acl_imagesegmentation_adsp_tpu.train.losses import LossManager

H = W = 320
N = 512


def make_store():
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((N, H, W)).astype(np.float32)
    yy, xx = np.mgrid[:H, :W]
    msks = np.stack([((yy - H // 2) ** 2 + (xx - W // 2) ** 2 <
                      (80 + (i % 40)) ** 2) for i in range(N)]).astype(np.int32)
    s = SliceStore(images=imgs, masks=msks, vol_starts=np.asarray([0]),
                   vol_sizes=np.asarray([N]), files=["bench"])
    return s.to_device(k=1)


def measure(engine, store, batch, reps=4):
    state = engine.init_state(jax.random.PRNGKey(0),
                              jnp.zeros((1, H, W, 1), jnp.float32))
    perm = epoch_permutation(jax.random.PRNGKey(1), N, batch)
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
    return reps * steps * batch / dt, dt / (reps * steps) * 1e3


def run_case(name, batch, remat=False, phase_max=None):
    old = _u2._DecoderBlock._PHASE_INTERNAL_MAX_CH
    if phase_max is not None:
        _u2._DecoderBlock._PHASE_INTERNAL_MAX_CH = phase_max
    try:
        model = build_unet("unet", "resnet34", "none", in_ch=1, classes=1,
                          dtype=jnp.bfloat16, remat=remat)
        eng = Engine(model, LossManager(classes=1, name="dice_bce"),
                     make_optimizer(1e-3, 1e-4, 5.0), classes=1, aug="light")
        rate, ms = measure(eng, STORE, batch)
        print(f"{name}: {rate:.1f} slices/s ({ms:.2f} ms/step)", flush=True)
    finally:
        _u2._DecoderBlock._PHASE_INTERNAL_MAX_CH = old


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    STORE = make_store()
    run_case("base_b128", 128)
    run_case("remat_b128", 128, remat=True)
    run_case("base_b256", 256)
    run_case("remat_b256", 256, remat=True)
    run_case("phase64_b128", 128, phase_max=64)
