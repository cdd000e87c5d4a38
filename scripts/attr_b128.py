"""Join the b128 epoch trace (per-op device times) with the compiled HLO
(which fusions contain convolutions; source-line attribution) to say where
the non-MXU time goes — the r5 MFU-bound attribution (VERDICT r4 #3).

Needs /tmp/unet_train_trace_b128 from scripts/trace_train_b128.py (same
N=512 store / b128 shapes so the compile cache serves the HLO dump).

Run: nohup python scripts/attr_b128.py > /tmp/attr_b128.log 2>&1 &
"""
import glob
import gzip
import json
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


def dump_hlo() -> str:
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
    lowered = engine._train_epoch_c.lower(
        state, store.images, store.masks, store.neighbors, perm,
        jax.random.PRNGKey(2), batch_size=BATCH)
    txt = lowered.compile().as_text()
    with open("/tmp/epoch_b128.hlo", "w") as f:
        f.write(txt)
    print(f"HLO: {len(txt)} bytes -> /tmp/epoch_b128.hlo", flush=True)
    return txt


def parse_fusion_info(txt: str):
    """fusion name -> (has_conv, source tag of the root call site)."""
    # fused computations: %fused_computation.N { ... }  referenced by
    # fusion ops via calls=%fused_computation.N
    comp_has_conv = {}
    for m in re.finditer(r"^(%?[\w.\-]+) \([^)]*\) -> [^{]+ \{(.*?)^\}",
                         txt, re.MULTILINE | re.DOTALL):
        name, body = m.groups()
        comp_has_conv[name.lstrip("%")] = "convolution(" in body
    info = {}
    # NOTE the output shape may be a tuple "(bf16[...], f32[...])" — match
    # anything up to " fusion(" on the same line
    for m in re.finditer(
            r"^\s*%?([\w.\-]+) = [^\n]*? fusion\((?:[^\n]*?)"
            r"calls=%?([\w.\-]+)(?:[^\n]*?source_file=\"([^\"]+)\""
            r" source_line=(\d+))?", txt, re.MULTILINE):
        op, callee, sf, sl = m.groups()
        tag = (sf.split("/")[-1] + ":" + sl) if sf else "?"
        info[op] = (comp_has_conv.get(callee, False), tag)
    # bare convolutions outside fusions
    convs = set()
    for m in re.finditer(r"^\s*%?([\w.\-]+) = \S+ convolution\(",
                         txt, re.MULTILINE):
        convs.add(m.group(1))
    return info, convs


def main():
    import os
    if os.path.exists("/tmp/epoch_b128.hlo"):
        txt = open("/tmp/epoch_b128.hlo").read()
        print("reusing /tmp/epoch_b128.hlo", flush=True)
    else:
        txt = dump_hlo()
    info, bare_convs = parse_fusion_info(txt)
    n_conv_fusions = sum(1 for has, _ in info.values() if has)
    print(f"{len(info)} fusions in HLO, {n_conv_fusions} contain a "
          f"convolution; {len(bare_convs)} bare convolutions", flush=True)

    files = glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "Tensor" in n or "/device" in n.lower()}

    steps = N // BATCH
    cats = defaultdict(float)
    lines = defaultdict(float)
    total = 0.0
    skipped = {"2", "while.6"}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        if name in skipped or name.startswith("jit_"):
            continue  # container events double-count their children
        dur = e.get("dur", 0) / 1e3
        total += dur
        if name in info:
            has_conv, tag = info[name]
            cats["conv_fusion" if has_conv else "elementwise_fusion"] += dur
            if not has_conv:
                lines[tag] += dur
        elif name in bare_convs or "convolution" in name:
            cats["bare_conv"] += dur
        elif any(k in name for k in ("copy", "transpose", "bitcast")):
            cats["copy"] += dur
        elif "fusion" in name:
            cats["unmatched_fusion"] += dur
        else:
            cats["other"] += dur

    print(f"\ntotal attributed device time {total:.1f} ms "
          f"({total/steps:.2f} ms/step at b{BATCH})")
    print("-- categories (ms/step) --")
    for c, d in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {d/steps:8.2f} ms  {d/total*100:5.1f}%  {c}")
    print("-- elementwise fusion time by source line (ms/step, top 25) --")
    for tag, d in sorted(lines.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {d/steps:8.3f} ms  {tag}")


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
