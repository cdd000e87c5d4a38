"""Trace the FULL engine train step at the reference config (batch 8,
aug=light, 320², bf16 ResNet34-U-Net) — including the HBM-store gather and
the on-device augmentation — and print the per-op device-time breakdown.

This is the step behind bench.py's train_slices_per_sec_aug_light; the
bare-model trace (scripts/trace_train.py) misses gather+augment.

Run:  nohup python scripts/trace_train_b8.py > /tmp/trace_b8.log 2>&1 &
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mri_acl_imagesegmentation_adsp_tpu.utils.compile_cache import (
    enable_compilation_cache)
enable_compilation_cache()

from mri_acl_imagesegmentation_adsp_tpu.data.hbm_loader import (
    SliceStore, epoch_permutation)
from mri_acl_imagesegmentation_adsp_tpu.models import build_unet
from mri_acl_imagesegmentation_adsp_tpu.train.engine import (
    Engine, make_optimizer)
from mri_acl_imagesegmentation_adsp_tpu.train.losses import LossManager

B, H = 8, 320
N = 128
TRACE_DIR = "/tmp/train_b8_trace"


def category(name: str) -> str:
    n = name.lower()
    for key in ("conv", "dot", "fusion", "copy", "transpose", "reduce",
                "scatter", "gather", "rng", "all-reduce", "select",
                "dynamic"):
        if key in n:
            return key
    return "other"


def main():
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((N, H, H)).astype(np.float32)
    yy, xx = np.mgrid[:H, :H]
    msks = np.stack([((yy - H // 2) ** 2 + (xx - H // 2) ** 2 <
                      (80 + (i % 40)) ** 2) for i in range(N)]).astype(np.int32)
    store = SliceStore(images=imgs, masks=msks, vol_starts=np.asarray([0]),
                       vol_sizes=np.asarray([N]), files=["bench"]
                       ).to_device(k=1)
    model = build_unet("unet", "resnet34", "none", in_ch=1, classes=1,
                       dtype=jnp.bfloat16)
    engine = Engine(model, LossManager(classes=1, name="dice_bce"),
                    make_optimizer(1e-3, 1e-4, 5.0), classes=1, aug="light")
    state = engine.init_state(jax.random.PRNGKey(0),
                              jnp.zeros((1, H, H, 1), jnp.float32))
    perm = epoch_permutation(jax.random.PRNGKey(1), N, B)
    steps = int(perm.shape[0])

    state, losses = engine.train_one_epoch_async(state, store, perm,
                                                 jax.random.PRNGKey(2))
    engine.check_epoch_losses(losses)
    t0 = time.perf_counter()
    state, losses = engine.train_one_epoch_async(state, store, perm,
                                                 jax.random.PRNGKey(3))
    engine.check_epoch_losses(losses)
    t1 = time.perf_counter()
    print(f"epoch of {steps} steps: {(t1-t0)*1e3:.1f} ms = "
          f"{(t1-t0)/steps*1e3:.2f} ms/step = "
          f"{steps*B/(t1-t0):.1f} slices/s", flush=True)

    with jax.profiler.trace(TRACE_DIR):
        state, losses = engine.train_one_epoch_async(state, store, perm,
                                                     jax.random.PRNGKey(4))
        engine.check_epoch_losses(losses)

    files = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"),
                      recursive=True)
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {pp for pp, n in pid_names.items()
                if "TPU" in n or "Tensor" in n or "/device" in n.lower()}
    agg = defaultdict(float)
    cats = defaultdict(float)
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        d = ev.get("dur", 0) / 1e3
        agg[ev.get("name", "")] += d
        cats[category(ev.get("name", ""))] += d
        total += d
    print(f"total device op time {total:.2f} ms over {steps} steps = "
          f"{total/steps:.3f} ms/step", flush=True)
    print("-- by category (ms/step) --")
    for name, dur in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {dur/steps:8.3f} ms  {dur/total*100:5.1f}%  {name}")
    print("-- top ops (ms/step) --")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {dur/steps:8.3f} ms  {dur/total*100:5.1f}%  {name[:120]}")


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
