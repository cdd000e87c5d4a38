"""Per-op device-time breakdown of the REAL b128 tuned train step
(engine epoch path: HBM store gather + separable-warp aug + fwd/bwd +
AdamW), for the r5 MFU-bound attribution (VERDICT r4 #3).

Run: nohup python scripts/trace_train_b128.py > /tmp/trace_b128.log 2>&1 &
"""
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

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
TRACE_DIR = "/tmp/unet_train_trace_b128"

# op-name -> category buckets (TPU trace op names carry the HLO op kind)
CATS = (
    ("conv", ("convolution", "conv")),
    ("matmul", ("dot",)),
    ("copy", ("copy", "transpose", "bitcast")),
    ("allreduce", ("all-reduce", "reduce-scatter", "all-gather")),
    ("dynamic", ("dynamic-slice", "dynamic-update-slice", "gather",
                 "scatter")),
    ("fusion", ("fusion", "loop_")),
)


def cat_of(name: str) -> str:
    low = name.lower()
    for cat, keys in CATS:
        if any(k in low for k in keys):
            return cat
    return "other"


def main():
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((N, H, W)).astype(np.float32)
    yy, xx = np.mgrid[:H, :W]
    msks = np.stack([((yy - H // 2) ** 2 + (xx - W // 2) ** 2 <
                      (80 + (i % 40)) ** 2) for i in range(N)]).astype(np.int32)
    store = SliceStore(images=imgs, masks=msks, vol_starts=np.asarray([0]),
                       vol_sizes=np.asarray([N]),
                       files=["bench"]).to_device(k=1)
    model = build_unet("unet", "resnet34", "none", in_ch=1, classes=1,
                       dtype=jnp.bfloat16)
    engine = Engine(model, LossManager(classes=1, name="dice_bce"),
                    make_optimizer(1e-3, 1e-4, 5.0), classes=1, aug="light")
    state = engine.init_state(jax.random.PRNGKey(0),
                              jnp.zeros((1, H, W, 1), jnp.float32))
    perm = epoch_permutation(jax.random.PRNGKey(1), N, BATCH)
    steps = perm.shape[0]
    state, _, _ = engine.train_one_epoch(state, store, perm,
                                         jax.random.PRNGKey(2),
                                         dataset_len=N)   # compile + warm
    with jax.profiler.trace(TRACE_DIR):
        state, losses = engine.train_one_epoch_async(
            state, store, perm, jax.random.PRNGKey(3))
        engine.check_epoch_losses(np.asarray(losses)[None], state)

    files = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"),
                      recursive=True)
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "Tensor" in n or "/device" in n.lower()}
    agg = defaultdict(float)
    cats = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        dur = e.get("dur", 0) / 1e3
        agg[e.get("name", "")] += dur
        cats[cat_of(e.get("name", ""))] += dur
        total += dur
    print(f"total device op time {total:.2f} ms over {steps} steps "
          f"({total / steps:.2f} ms/step at b{BATCH})")
    print("-- categories --")
    for c, d in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {d/steps:8.3f} ms/step  {d/total*100:5.1f}%  {c}")
    print("-- top ops --")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:50]:
        print(f"  {dur/steps:8.3f} ms  {dur/total*100:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
