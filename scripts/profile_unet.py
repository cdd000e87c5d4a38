"""Profile the flagship U-Net inference path on the real TPU.

Answers, with measurements (not guesses):
  1. slices/s vs batch size (does batching amortize fixed costs?)
  2. device-only time via a chained fori_loop jit (is Python/relay dispatch
     a tax on the per-call numbers?)
  3. encoder-only vs full model (how much does the decoder cost?)
  4. analytic FLOPs via cost_analysis -> MFU estimate.

Run:  nohup python scripts/profile_unet.py > /tmp/profile_unet.log 2>&1 &
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mri_acl_imagesegmentation_adsp_tpu.utils.compile_cache import (
    enable_compilation_cache)
enable_compilation_cache()

from mri_acl_imagesegmentation_adsp_tpu.models import build_unet
from mri_acl_imagesegmentation_adsp_tpu.models.unet2d import ResNetEncoder

SHAPE = (320, 320)
PEAK_BF16 = 394e12  # v5e ~394 TFLOP/s bf16


def timed(fn, *args, iters=32, warmup=3):
    for _ in range(warmup):
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices(), flush=True)
    model = build_unet("unet", "resnet34", "none", in_ch=1, classes=1,
                       dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)

    # ---- 1) batch sweep ----
    results = {}
    for batch in (16, 32, 64, 128):
        x = jnp.asarray(rng.standard_normal((batch, *SHAPE, 1)),
                        jnp.float32)
        variables = jax.jit(partial(model.init, train=False))(
            jax.random.PRNGKey(0), x[:1])
        params = variables["params"]
        bs = variables.get("batch_stats", {})

        @jax.jit
        def infer(params, bs, x):
            return jax.nn.sigmoid(
                model.apply({"params": params, "batch_stats": bs}, x,
                            train=False))

        t = timed(infer, params, bs, x)
        results[batch] = batch / t
        print(f"batch {batch:4d}: {t*1e3:8.2f} ms/call  "
              f"{batch/t:8.1f} slices/s", flush=True)

        if batch == 32:
            # cost analysis -> flops
            try:
                c = infer.lower(params, bs, x).compile().cost_analysis()
                if isinstance(c, list):
                    c = c[0]
                flops = c.get("flops", 0.0)
                print(f"  cost_analysis flops={flops:.3e}  "
                      f"MFU={flops/t/PEAK_BF16*100:.1f}%", flush=True)
            except Exception as e:
                print("  cost_analysis failed:", e, flush=True)

            # ---- 2) device-only: chain 8 calls in one jit ----
            @jax.jit
            def infer8(params, bs, x):
                def body(i, acc):
                    y = model.apply({"params": params, "batch_stats": bs},
                                    x + acc * 1e-8, train=False)
                    return jnp.mean(y)
                return jax.lax.fori_loop(0, 8, body, jnp.float32(0))

            t8 = timed(infer8, params, bs, x, iters=8)
            print(f"  chained x8: {t8/8*1e3:8.2f} ms/iter (device-only)  "
                  f"dispatch tax ≈ {(t - t8/8)*1e3:.2f} ms/call", flush=True)

            # ---- 3) encoder-only ----
            enc = ResNetEncoder("resnet34", dtype=jnp.bfloat16)
            ev = jax.jit(partial(enc.init, train=False))(
                jax.random.PRNGKey(0), x[:1])

            @jax.jit
            def enc_only(v, x):
                feats = enc.apply(v, x, train=False)
                return jnp.mean(feats[-1])

            te = timed(enc_only, ev, x)
            print(f"  encoder-only: {te*1e3:8.2f} ms/call "
                  f"({te/t*100:.0f}% of full)", flush=True)

    print("\nsummary slices/s:", {k: round(v, 1) for k, v in results.items()},
          flush=True)


if __name__ == "__main__":
    main()
