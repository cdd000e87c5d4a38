"""Measure the 3-D residual U-Net train step + inference on the real TPU at
the reference config (ROI 160x160x64, batch 2, channels (32,64,128,256,320)
— reference src/train/train_unet3d.py:93-97; it publishes no numbers).

Run:  nohup python scripts/measure_unet3d.py > /tmp/measure_unet3d.log 2>&1 &
"""
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax
from jax import lax

from mri_acl_imagesegmentation_adsp_tpu.utils.compile_cache import (
    enable_compilation_cache)
enable_compilation_cache()

from mri_acl_imagesegmentation_adsp_tpu.models import build_unet3d

B, D, H, W = 2, 64, 160, 160


def main():
    model = build_unet3d(classes=1, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, D, H, W, 1)), jnp.float32)
    t = jnp.asarray((rng.random((B, D, H, W)) > 0.5), jnp.float32)
    v = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(0),
                                                  x[:1])
    tx = optax.adamw(1e-3, weight_decay=1e-4)
    opt = tx.init(v["params"])

    @jax.jit
    def infer4(v, x):
        def body(i, acc):
            return jnp.mean(model.apply(v, x + acc * 1e-8, train=False))
        return lax.fori_loop(0, 4, body, jnp.float32(0))

    np.asarray(infer4(v, x))
    t0 = time.perf_counter()
    for _ in range(4):
        out = infer4(v, x)
    np.asarray(out)
    ti = (time.perf_counter() - t0) / 16
    print(f"unet3d infer:  {ti*1e3:7.2f} ms/batch{B} "
          f"({B*D/ti:6.0f} eq-slices/s)", flush=True)

    @jax.jit
    def step(params, opt, x, t):
        def loss_fn(p):
            logits = model.apply({"params": p}, x, train=True)
            return jnp.mean(
                (jax.nn.sigmoid(logits[..., 0]) - t) ** 2)
        l, g = jax.value_and_grad(loss_fn)(params)
        upd, nopt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), nopt, l

    p = v["params"]
    p, opt, l = step(p, opt, x, t)
    float(l)
    t0 = time.perf_counter()
    for _ in range(8):
        p, opt, l = step(p, opt, x, t)
    float(l)
    tt = (time.perf_counter() - t0) / 8
    print(f"unet3d train:  {tt*1e3:7.2f} ms/step (batch {B}, "
          f"{B*D*H*W/tt/1e6:.0f} Mvox/s)", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
