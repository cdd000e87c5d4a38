"""Capture a jax.profiler trace of flagship inference and print the per-op
time breakdown (aggregated from the Chrome-trace JSON on the device track).

Run:  nohup python scripts/trace_unet.py > /tmp/trace_unet.log 2>&1 &
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mri_acl_imagesegmentation_adsp_tpu.utils.compile_cache import (
    enable_compilation_cache)
enable_compilation_cache()

from mri_acl_imagesegmentation_adsp_tpu.models.unet2d import ResNetEncoderUNet

B, H = int(__import__('os').environ.get('TRACE_BATCH', 32)), 320
TRACE_DIR = "/tmp/unet_trace"


def run_model(fused: bool, tag: str):
    model = ResNetEncoderUNet("resnet34", classes=1, dtype=jnp.bfloat16,
                              fused_decoder=fused)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, H, 1)), jnp.float32)
    v = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(0),
                                                  x[:1])
    params, bs = v["params"], v.get("batch_stats", {})

    @jax.jit
    def infer(params, bs, x):
        return jax.nn.sigmoid(
            model.apply({"params": params, "batch_stats": bs}, x,
                        train=False))

    for _ in range(3):
        np.asarray(infer(params, bs, x))

    tdir = f"{TRACE_DIR}_{tag}"
    with jax.profiler.trace(tdir):
        for _ in range(4):
            out = infer(params, bs, x)
        out.block_until_ready()
    return tdir


def summarize(tdir: str, top: int = 28):
    files = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace files under", tdir)
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find device (TensorCore) process ids
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "Tensor" in n or "/device" in n.lower()}
    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # ms
        agg[name] += dur
        total += dur
    print(f"\n== {tdir}  (total device op time {total:.2f} ms over 4 calls, "
          f"{total/4:.2f} ms/call) ==")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {dur/4:8.3f} ms  {dur/total*100:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for fused in (False, True):
        tag = "fused" if fused else "naive"
        tdir = run_model(fused, tag)
        summarize(tdir)
