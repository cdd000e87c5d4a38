"""Measure int8 (w8a8) serving throughput vs bf16 on the real TPU.

Quantizes the flagship ResNet34-U-Net (infer/quant.py), then times the
batch-256 sustained scan (the bench.py headline pattern) for:
  - bf16 fused (production path today),
  - bf16 naive (the dataflow the quant engine mirrors),
  - int8 w8a8,
  - folded weight-only int8 (isolates activation quantization).

Also cross-checks prediction agreement (thresholded masks) between int8
and bf16 on-chip. Run: nohup python scripts/measure_int8.py > /tmp/int8.log 2>&1 &
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

from mri_acl_imagesegmentation_adsp_tpu.utils.compile_cache import (
    enable_compilation_cache)

enable_compilation_cache()

import jax
import jax.numpy as jnp

from mri_acl_imagesegmentation_adsp_tpu.infer.quant import (
    QuantConfig, QuantizedUNet2D)
from mri_acl_imagesegmentation_adsp_tpu.models import build_unet

BATCH = 256
STEPS = 4
SHAPE = (320, 320)
REPS = 4


def scalar(a):
    return np.asarray(a[(0,) * a.ndim])


def time_scan(fn, x_all):
    @jax.jit
    def run(x_all):
        def body(_, xb):
            return None, jax.nn.sigmoid(fn(xb))
        return jax.lax.scan(body, None, x_all)[1]

    probs = run(x_all)
    scalar(probs)  # compile + surface errors
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        probs = run(x_all)
        scalar(probs)
        best = min(best, time.perf_counter() - t0)
    return STEPS * BATCH / best, probs


_PROBE_F32 = """
import numpy as np, jax, jax.numpy as jnp
y = jax.jit(lambda a: a @ a)(jnp.ones((128, 128), jnp.float32))
assert float(np.asarray(y)[0, 0]) == 128.0
print("f32 probe ok", flush=True)
"""

_PROBE_INT8 = """
import numpy as np, jax.numpy as jnp
from jax import lax
x = jnp.ones((1, 8, 8, 8), jnp.int8)
w = jnp.ones((3, 3, 8, 8), jnp.int8)
y = lax.conv_general_dilated(
    x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    preferred_element_type=jnp.int32)
assert int(np.asarray(y)[0, 4, 4, 0]) == 72
print("int8 conv probe ok", flush=True)
"""


def probe_int8_conv():
    """Probe in throwaway subprocesses with timeouts, f32 before int8.

    Two separate probes distinguish "relay down" (f32 hangs too) from
    "backend lacks integer convs" (f32 fine, int8 hangs/errors) — a hung
    compile wedges the relay for minutes, so fail fast here instead of
    wedging it with the full b256 program. 2026-08-18 incident: the int8
    probe sat >16 min with the relay dead for over an hour around it, so
    neither question could be answered in-process.
    """
    import subprocess
    # 600s f32 budget: with a queue of measurement scripts sharing the
    # relay, a cold compile behind another process's drain exceeded the
    # old 300s twice (r4 queue) even though the relay was healthy
    for tag, code, budget in (("f32", _PROBE_F32, 600),
                              ("int8", _PROBE_INT8, 600)):
        try:
            out = subprocess.run([sys.executable, "-c", code],
                                 capture_output=True, text=True,
                                 timeout=budget)
        except subprocess.TimeoutExpired:
            raise SystemExit(
                f"{tag} probe timed out after {budget}s: "
                + ("TPU relay unresponsive — retry later" if tag == "f32"
                   else "relay fine but int8 conv never compiled — "
                        "backend likely lacks integer convs"))
        if out.returncode != 0:
            raise SystemExit(f"{tag} probe failed:\n{out.stderr[-2000:]}")
        print(out.stdout.strip(), flush=True)


def main():
    probe_int8_conv()
    rng = np.random.default_rng(0)
    x_all = jnp.asarray(rng.standard_normal(
        (STEPS, BATCH, *SHAPE, 1)).astype(np.float32))

    results = {}
    for fused, tag in ((True, "bf16_fused"), (False, "bf16_naive")):
        model = build_unet("unet", "resnet34", "none", in_ch=1, classes=1,
                           dtype=jnp.bfloat16, fused_decoder=fused)
        variables = jax.jit(partial(model.init, train=False))(
            jax.random.PRNGKey(0), x_all[0, :1])
        fn = lambda xb: model.apply(variables, xb, train=False)
        rate, probs = time_scan(fn, x_all)
        results[tag] = rate
        print(f"{tag}: {rate:.1f} slices/s", flush=True)
        if not fused:
            ref_probs = np.asarray(probs[0])
            base_model, base_vars = model, variables

    calib = [np.asarray(x_all[0, :32], np.float32)]
    for mode in ("int8", "folded"):
        eng, qtree = QuantizedUNet2D.from_model(
            base_model, base_vars, calib,
            QuantConfig(mode=mode, compute_dtype=jnp.bfloat16))
        rate, probs = time_scan(lambda xb: eng.apply(qtree, xb), x_all)
        results[mode] = rate
        print(f"{mode}: {rate:.1f} slices/s", flush=True)
        if mode == "int8":
            q = np.asarray(probs[0]) > 0.5
            r = ref_probs > 0.5
            inter = (q & r).sum()
            dice = 2 * inter / max(q.sum() + r.sum(), 1)
            print(f"int8 vs bf16 mask dice (random-init net): {dice:.4f}",
                  flush=True)

    print({k: round(v, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
