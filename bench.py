"""Benchmark: U-Net inference slices/sec/chip (the BASELINE.json headline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's committed run sustains ~70 slices/s train-only on
its RTX 3060 (BASELINE.md, derived from runs/fastmri_unet CSVs; the repo
publishes no inference number, so the training throughput is the comparison
point). Config matches the reference benchmark: ResNet34-encoder U-Net,
320x320 single-channel slices, bf16 compute.

Complex-free by construction (ops/fftc.py real-pair design) — safe on
backends without complex/FFT support.
"""

import json
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

REFERENCE_TRAIN_SLICES_PER_SEC = 70.0  # BASELINE.md derived train-only rate
BATCH = 32
SHAPE = (320, 320)
WARMUP_ITERS = 4
ITERS = 64


def main() -> None:
    from mri_acl_imagesegmentation_adsp_tpu.utils.compile_cache import (
        enable_compilation_cache)
    enable_compilation_cache()
    from mri_acl_imagesegmentation_adsp_tpu.models import build_unet

    model = build_unet("unet", "resnet34", "none", in_ch=1, classes=1,
                       dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, *SHAPE, 1)).astype(np.float32))
    # jitted init: one cached program instead of hundreds of eager dispatches
    variables = jax.jit(partial(model.init, train=False))(
        jax.random.PRNGKey(0), x[:1])
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    @jax.jit
    def infer(params, batch_stats, x):
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             x, train=False)
        return jax.nn.sigmoid(logits)

    for _ in range(WARMUP_ITERS):
        np.asarray(infer(params, batch_stats, x))

    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = infer(params, batch_stats, x)
    np.asarray(out)  # block + surface lazy errors
    t1 = time.perf_counter()

    slices_per_sec = BATCH * ITERS / (t1 - t0)
    print(json.dumps({
        "metric": "unet2d_infer_slices_per_sec_per_chip",
        "value": round(slices_per_sec, 2),
        "unit": "slices/s",
        "vs_baseline": round(slices_per_sec / REFERENCE_TRAIN_SLICES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
