"""Dump the compiled VarNet train-step HLO and aggregate copy/fusion ops
by shape — the r3 trace shows 47.6 ms/step of copies and 72.6 ms of
fusions vs only 11.6 ms of convs, so the win is in layout/traffic, not
MXU work.

Run:  nohup python scripts/dump_hlo_varnet.py > /tmp/dump_hlo_varnet.log 2>&1 &
"""
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")

from mri_acl_imagesegmentation_adsp_tpu.utils.compile_cache import (
    enable_compilation_cache)
enable_compilation_cache()

import jax
import jax.numpy as jnp

from mri_acl_imagesegmentation_adsp_tpu.train.varnet_trainer import (
    VarNetArgs, VarNetTrainer)

C, A, H, W = 12, 3, 320, 320

DT_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "f16": 2,
            "s8": 1, "u8": 1, "f64": 8, "s64": 8}


def shape_bytes(shape: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", shape)
    if not m:
        return 0
    dt = DT_BYTES.get(m.group(1), 4)
    dims = [int(d) for d in m.group(2).split(",") if d]
    n = 1
    for d in dims:
        n *= d
    return n * dt


def main():
    rng = np.random.default_rng(0)
    args = VarNetArgs(out_dir="/tmp/varnet_hlo", num_cascades=10,
                      sens_chans=8, chans=18, amp=True)
    tr = VarNetTrainer(args)
    k = jnp.asarray(rng.standard_normal((1, C, A, H, W, 2))
                    .astype(np.float32) * 0.1)
    e = jnp.asarray(rng.standard_normal((1, C, A, H, W, 2))
                    .astype(np.float32))
    t = jnp.asarray(rng.standard_normal((H, W)).astype(np.float32))[None]
    mv = jnp.asarray([1.0], jnp.float32)
    tr._init_if_needed(k, e)
    txt = tr._train_step.lower(tr.params, tr.opt_state, k, e, t,
                               mv).compile().as_text()
    with open("/tmp/varnet_step.hlo", "w") as f:
        f.write(txt)
    print(f"HLO: {len(txt)} bytes -> /tmp/varnet_step.hlo", flush=True)

    # copies by (shape, layout-change) and fusions by output shape
    copies = defaultdict(lambda: [0, 0])
    fusions = defaultdict(lambda: [0, 0])
    n_copy = n_fus = 0
    for m in re.finditer(
            r"^\s*%?([\w.\-]+) = (\S+?) (copy|fusion|transpose|bitcast)\(",
            txt, re.MULTILINE):
        name, shape, op = m.groups()
        b = shape_bytes(shape)
        if op in ("copy", "transpose"):
            copies[shape][0] += 1
            copies[shape][1] += b
            n_copy += 1
        elif op == "fusion":
            fusions[shape][0] += 1
            fusions[shape][1] += b
            n_fus += 1

    print(f"\n== {n_copy} copy/transpose ops, by shape (top 20 by bytes) ==")
    for shape, (cnt, b) in sorted(copies.items(),
                                  key=lambda kv: -kv[1][1])[:20]:
        print(f"  {cnt:4d} x {shape:48s} {b/1e6:9.1f} MB total")
    total_copy = sum(b for _, b in copies.values())
    print(f"  TOTAL copy/transpose output bytes: {total_copy/1e6:.1f} MB")

    print(f"\n== {n_fus} fusions, by output shape (top 20 by bytes) ==")
    for shape, (cnt, b) in sorted(fusions.items(),
                                  key=lambda kv: -kv[1][1])[:20]:
        print(f"  {cnt:4d} x {shape:48s} {b/1e6:9.1f} MB total")
    total_fus = sum(b for _, b in fusions.values())
    print(f"  TOTAL fusion output bytes: {total_fus/1e6:.1f} MB")


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
