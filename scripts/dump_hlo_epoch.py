"""Dump the compiled b8 epoch-scan HLO and aggregate copy/fusion ops by
shape inside the scan body — the b8 step is fusion-bound (trace: ~7 ms
fusions + 1.75 ms copies vs 1.5 ms convs per 11.3 ms step), so find the
big-bytes fusion classes the way scripts/dump_hlo_varnet.py did for VarNet.

Run:  nohup python scripts/dump_hlo_epoch.py > /tmp/dump_hlo_epoch.log 2>&1 &
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

from mri_acl_imagesegmentation_adsp_tpu.data.hbm_loader import (
    SliceStore, epoch_permutation)
from mri_acl_imagesegmentation_adsp_tpu.models import build_unet
from mri_acl_imagesegmentation_adsp_tpu.train.engine import (
    Engine, make_optimizer)
from mri_acl_imagesegmentation_adsp_tpu.train.losses import LossManager

import os

H = W = 320
N = 256
BATCH = int(os.environ.get("DUMP_BATCH", "8"))   # e.g. DUMP_BATCH=128

DT_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "f16": 2,
            "s8": 1, "u8": 1, "f64": 8, "s64": 8}


def shape_bytes(shape: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", shape)
    if not m:
        return 0
    dt = DT_BYTES.get(m.group(1), 4)
    n = 1
    for d in [int(d) for d in m.group(2).split(",") if d]:
        n *= d
    return n * dt


def main():
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
    perm = epoch_permutation(jax.random.PRNGKey(1), N, BATCH)
    lowered = engine._train_epoch_c.lower(
        state, store.images, store.masks, store.neighbors, perm,
        jax.random.PRNGKey(2), batch_size=BATCH)
    txt = lowered.compile().as_text()
    with open("/tmp/epoch_b8.hlo", "w") as f:
        f.write(txt)
    print(f"HLO: {len(txt)} bytes -> /tmp/epoch_b8.hlo", flush=True)

    copies = defaultdict(lambda: [0, 0])
    fusions = defaultdict(lambda: [0, 0])
    for m in re.finditer(
            r"^\s*%?([\w.\-]+) = (\S+?) (copy|fusion|transpose)\(",
            txt, re.MULTILINE):
        _, shape, op = m.groups()
        tgt = copies if op in ("copy", "transpose") else fusions
        tgt[shape][0] += 1
        tgt[shape][1] += shape_bytes(shape)

    for label, agg in (("copy/transpose", copies), ("fusion", fusions)):
        total = sum(b for _, b in agg.values())
        print(f"\n== {label}: {sum(c for c, _ in agg.values())} ops, "
              f"{total/1e6:.1f} MB output bytes; top 20 ==")
        for shape, (cnt, b) in sorted(agg.items(),
                                      key=lambda kv: -kv[1][1])[:20]:
            print(f"  {cnt:4d} x {shape:52s} {b/1e6:9.1f} MB")


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
