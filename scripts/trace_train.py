"""Trace one training step (fwd+bwd+AdamW update) of the flagship config
and print the per-op device-time breakdown.

Run:  nohup python scripts/trace_train.py > /tmp/trace_train.log 2>&1 &
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
import optax

from mri_acl_imagesegmentation_adsp_tpu.utils.compile_cache import (
    enable_compilation_cache)
enable_compilation_cache()

from mri_acl_imagesegmentation_adsp_tpu.models.unet2d import ResNetEncoderUNet

B, H = 32, 320
TRACE_DIR = "/tmp/unet_train_trace"


def main():
    model = ResNetEncoderUNet("resnet34", classes=1, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, H, 1)), jnp.float32)
    y = jnp.asarray((rng.random((B, H, H)) > 0.5), jnp.float32)
    v = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(0), x[:1])
    params, bs = v["params"], v.get("batch_stats", {})
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adamw(1e-3, weight_decay=1e-4))
    opt = tx.init(params)

    @jax.jit
    def step(params, bs, opt, x, y):
        def loss_fn(p):
            logits, upd = model.apply(
                {"params": p, "batch_stats": bs}, x, train=True,
                mutable=["batch_stats"])
            l = jnp.mean((jax.nn.sigmoid(logits[..., 0]) - y) ** 2)
            return l, upd["batch_stats"]
        (l, nbs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, nopt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), nbs, nopt, l

    for _ in range(3):
        params, bs, opt, l = step(params, bs, opt, x, y)
    float(l)

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(4):
            params, bs, opt, l = step(params, bs, opt, x, y)
        float(l)

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
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        agg[e.get("name", "")] += e.get("dur", 0) / 1e3
        total += e.get("dur", 0) / 1e3
    print(f"total device op time {total:.2f} ms over 4 steps, "
          f"{total/4:.2f} ms/step")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {dur/4:8.3f} ms  {dur/total*100:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
