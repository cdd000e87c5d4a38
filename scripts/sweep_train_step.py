"""Attribute the b8 reference-config train step cost on the real TPU.

Measures epoch-scan throughput (bench.py bench_train pattern) for ablations
that attribute the 11.1 ms/step budget (VERDICT r2 #2: target >= 800
slices/s aug-light at batch 8):

  base        : aug=light, AdamW+clip (the bench configuration)
  aug_none    : drop augmentation            -> aug cost
  flips_only  : aug=light with the separable warp disabled -> warp cost
  no_clip     : AdamW without global-norm clip -> clip pass cost
  sgd         : plain SGD momentum           -> optimizer elementwise cost

Run: nohup python scripts/sweep_train_step.py > /tmp/sweep_step.log 2>&1 &
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
import optax

from mri_acl_imagesegmentation_adsp_tpu.data.hbm_loader import (
    SliceStore, epoch_permutation)
from mri_acl_imagesegmentation_adsp_tpu.models import build_unet
from mri_acl_imagesegmentation_adsp_tpu.train.engine import (
    Engine, make_optimizer)
from mri_acl_imagesegmentation_adsp_tpu.train.losses import LossManager

H = W = 320
N = 256
BATCH = 8


def make_store():
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((N, H, W)).astype(np.float32)
    yy, xx = np.mgrid[:H, :W]
    msks = np.stack([((yy - H // 2) ** 2 + (xx - W // 2) ** 2 <
                      (80 + (i % 40)) ** 2) for i in range(N)]).astype(np.int32)
    return SliceStore(images=imgs, masks=msks, vol_starts=np.asarray([0]),
                      vol_sizes=np.asarray([N]),
                      files=["bench"]).to_device(k=1)


def measure(engine, store, reps=4, batch=None):
    batch = BATCH if batch is None else batch
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


def main():
    store = make_store()
    model = build_unet("unet", "resnet34", "none", in_ch=1, classes=1,
                       dtype=jnp.bfloat16)
    loss = LossManager(classes=1, name="dice_bce")

    cases = {}

    cases["base"] = Engine(model, loss, make_optimizer(1e-3, 1e-4, 5.0),
                           classes=1, aug="light")
    cases["unroll2"] = Engine(model, loss, make_optimizer(1e-3, 1e-4, 5.0),
                              classes=1, aug="light", scan_unroll=2)
    cases["unroll4"] = Engine(model, loss, make_optimizer(1e-3, 1e-4, 5.0),
                              classes=1, aug="light", scan_unroll=4)
    cases["aug_none"] = Engine(model, loss, make_optimizer(1e-3, 1e-4, 5.0),
                               classes=1, aug="none")
    # per-block backward remat: the b8 step is HBM-traffic-bound (~7 ms
    # elementwise fusions vs 1.5 ms convs of 11.1) — trade saved-activation
    # reads for recompute (models/unet2d.py remat flag; equality pinned in
    # tests/test_models.py::test_unet2d_remat_matches_naive_exactly)
    model_rmt = build_unet("unet", "resnet34", "none", in_ch=1, classes=1,
                           dtype=jnp.bfloat16, remat=True)
    cases["remat"] = Engine(model_rmt, loss, make_optimizer(1e-3, 1e-4, 5.0),
                            classes=1, aug="light")
    cases["remat_unroll2"] = Engine(model_rmt, loss,
                                    make_optimizer(1e-3, 1e-4, 5.0),
                                    classes=1, aug="light", scan_unroll=2)
    cases["no_clip"] = Engine(model, loss, make_optimizer(1e-3, 1e-4, 0.0),
                              classes=1, aug="light")
    # gradient accumulation: one AdamW+clip apply per 4 microbatches —
    # amortizes the ~1.5 ms optimizer tail of the 11.1 ms b8 step while
    # keeping the b8 activation working set (effective global batch 32)
    cases["accum4"] = Engine(model, loss, make_optimizer(1e-3, 1e-4, 5.0),
                             classes=1, aug="light", accum_steps=4)
    cases["accum4_remat"] = Engine(model_rmt, loss,
                                   make_optimizer(1e-3, 1e-4, 5.0),
                                   classes=1, aug="light", accum_steps=4)
    sgd = optax.inject_hyperparams(
        lambda learning_rate: optax.sgd(learning_rate, momentum=0.9)
    )(learning_rate=1e-3)
    cases["sgd"] = Engine(model, loss, sgd, classes=1, aug="light")

    # flips_only: monkeypatch the warp out of the light recipe
    import mri_acl_imagesegmentation_adsp_tpu.train.augment as aug_mod
    orig = aug_mod._warp_batch_separable
    aug_mod._warp_batch_separable = lambda x, y, p, h, w, cfg=None: (x, y)
    cases["flips_only"] = Engine(model, loss,
                                 make_optimizer(1e-3, 1e-4, 5.0),
                                 classes=1, aug="light")

    results = {}
    for name in ("flips_only", "base", "unroll2", "unroll4", "remat",
                 "remat_unroll2", "aug_none", "no_clip", "accum4",
                 "accum4_remat", "sgd"):
        if name != "flips_only":
            aug_mod._warp_batch_separable = orig
        rate, ms = measure(cases[name], store)
        results[name] = (round(rate, 1), round(ms, 2))
        print(f"{name}: {rate:.1f} slices/s ({ms:.2f} ms/step)", flush=True)

    # tuned-batch pass: attribute the same levers at the b32 sweet spot
    for name in ("base", "unroll2", "remat", "remat_unroll2"):
        rate, ms = measure(cases[name], store, batch=32)
        results[name + "_b32"] = (round(rate, 1), round(ms, 2))
        print(f"{name}_b32: {rate:.1f} slices/s ({ms:.2f} ms/step)",
              flush=True)

    # batch scaling past 32 (r4): the train/infer MFU gap (29% vs 56%)
    # suggests backward-conv efficiency wants a larger M dim too
    # (uncontended r4c run: b64 751, b128 1001.6 — the sweep winner,
    # b256 941 — past the HBM working-set knee)
    for b in (64, 128):
        rate, ms = measure(cases["base"], store, batch=b)
        results[f"base_b{b}"] = (round(rate, 1), round(ms, 2))
        print(f"base_b{b}: {rate:.1f} slices/s ({ms:.2f} ms/step)",
              flush=True)

    # b256 needs a bigger store to keep >=2 steps per epoch dispatch
    rng512 = np.random.default_rng(1)
    imgs512 = rng512.standard_normal((512, H, W)).astype(np.float32)
    yy2, xx2 = np.mgrid[:H, :W]
    msks512 = np.stack([((yy2 - H // 2) ** 2 + (xx2 - W // 2) ** 2 <
                         (80 + (i % 40)) ** 2)
                        for i in range(512)]).astype(np.int32)
    store512 = SliceStore(images=imgs512, masks=msks512,
                          vol_starts=np.asarray([0]),
                          vol_sizes=np.asarray([512]),
                          files=["bench512"]).to_device(k=1)
    for b in (256,):
        rate, ms = measure(cases["base"], store512, batch=b)
        results[f"base_b{b}"] = (round(rate, 1), round(ms, 2))
        print(f"base_b{b}: {rate:.1f} slices/s ({ms:.2f} ms/step)",
              flush=True)

    # bf16 slice store (r4): halves the gather+augment read traffic
    rng16 = np.random.default_rng(0)
    imgs = rng16.standard_normal((N, H, W)).astype(np.float32)
    yy, xx = np.mgrid[:H, :W]
    msks = np.stack([((yy - H // 2) ** 2 + (xx - W // 2) ** 2 <
                      (80 + (i % 40)) ** 2)
                     for i in range(N)]).astype(np.int32)
    store16 = SliceStore(images=imgs, masks=msks,
                         vol_starts=np.asarray([0]),
                         vol_sizes=np.asarray([N]),
                         files=["bench"]).to_device(k=1,
                                                    image_dtype=jnp.bfloat16)
    for b in (8, 32):
        rate, ms = measure(cases["base"], store16, batch=b)
        results[f"base_store16_b{b}"] = (round(rate, 1), round(ms, 2))
        print(f"base_store16_b{b}: {rate:.1f} slices/s ({ms:.2f} ms/step)",
              flush=True)

    print(results)


if __name__ == "__main__":
    main()
