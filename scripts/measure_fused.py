"""Measure fused (phase-space) vs naive decoder on the real TPU.

Device-only timings via chained fori_loop: full-model inference and one
training step (fwd+bwd+update-shaped grads), batch 32 @320^2, bf16.

Run:  nohup python scripts/measure_fused.py > /tmp/measure_fused.log 2>&1 &
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

from mri_acl_imagesegmentation_adsp_tpu.utils.compile_cache import (
    enable_compilation_cache)
enable_compilation_cache()

from mri_acl_imagesegmentation_adsp_tpu.models.unet2d import ResNetEncoderUNet

B, H = 32, 320


def timed(fn, *args, iters=16):
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def bench(fused: bool):
    model = ResNetEncoderUNet("resnet34", classes=1, dtype=jnp.bfloat16,
                              fused_decoder=fused)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, H, 1)), jnp.float32)
    y = jnp.asarray((rng.random((B, H, H)) > 0.5), jnp.float32)
    v = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(0),
                                                  x[:1])
    params, bs = v["params"], v.get("batch_stats", {})

    @jax.jit
    def infer8(params, bs, x):
        def body(i, acc):
            out = model.apply({"params": params, "batch_stats": bs},
                              x + acc * 1e-8, train=False)
            return jnp.mean(out)
        return lax.fori_loop(0, 8, body, jnp.float32(0))

    t_inf = timed(infer8, params, bs, x) / 8
    print(f"fused={fused}: infer {t_inf*1e3:7.2f} ms/batch "
          f"({B/t_inf:7.1f} slices/s device-only)", flush=True)

    @jax.jit
    def train4(params, bs, x, y):
        def loss_fn(p, xx):
            logits, upd = model.apply(
                {"params": p, "batch_stats": bs}, xx, train=True,
                mutable=["batch_stats"])
            l = jnp.mean(
                (jax.nn.sigmoid(logits[..., 0]) - y) ** 2)
            return l, upd

        def body(i, carry):
            acc, p = carry
            (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, x + acc * 1e-8)
            p = jax.tree_util.tree_map(lambda a, b: a - 1e-6 * b, p, g)
            return l, p

        l, p = lax.fori_loop(0, 4, body, (jnp.float32(0), params))
        return l, jax.tree_util.tree_leaves(p)[0]

    t_tr = timed(train4, params, bs, x, y, iters=8) / 4
    print(f"fused={fused}: train {t_tr*1e3:7.2f} ms/step "
          f"({B/t_tr:7.1f} slices/s device-only)", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    bench(False)
    bench(True)
