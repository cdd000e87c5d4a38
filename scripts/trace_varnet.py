"""Trace the VarNet training step at protocol shapes and print the per-op
device-time breakdown (the r2 profile was flat — no op >0.3%; this re-trace
groups by op CATEGORY too so the flatness becomes actionable).

Run:  nohup python scripts/trace_varnet.py > /tmp/trace_varnet.log 2>&1 &
"""
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mri_acl_imagesegmentation_adsp_tpu.utils.compile_cache import (
    enable_compilation_cache)
enable_compilation_cache()

from mri_acl_imagesegmentation_adsp_tpu.train.varnet_trainer import (
    VarNetArgs, VarNetTrainer)

C, A, H, W = 12, 3, 320, 320
TRACE_DIR = "/tmp/varnet_trace"


def category(name: str) -> str:
    n = name.lower()
    for key in ("conv", "dot", "fusion", "copy", "transpose", "reduce",
                "scatter", "gather", "rng", "all-reduce", "select"):
        if key in n:
            return key
    return "other"


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
    p, o = tr.params, tr.opt_state
    for _ in range(3):
        p, o, loss = tr._train_step(p, o, k, e, t, mv)
    float(loss)

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(4):
            p, o, loss = tr._train_step(p, o, k, e, t, mv)
        float(loss)

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
    print(f"total device op time {total:.2f} ms over 4 steps, "
          f"{total/4:.2f} ms/step", flush=True)
    print("-- by category --")
    for name, dur in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {dur/4:8.3f} ms  {dur/total*100:5.1f}%  {name}")
    print("-- top ops --")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {dur/4:8.3f} ms  {dur/total*100:5.1f}%  {name[:120]}")


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
