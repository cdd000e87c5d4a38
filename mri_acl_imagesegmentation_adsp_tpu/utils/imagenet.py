"""ImageNet input normalization — the ONE definition shared by training
and inference/serving.

Reference semantics (src/dataio/datasets.py:68-72,128-131): with
imagenet_norm on, a 1-channel slice is replicated to 3 channels and
normalized with the encoder's ImageNet mean/std AFTER augmentation. The
trainer (train/trainer.py) and every serving path (cli/infer, cli/serve,
cli/quantize calibration) build their transform here so the constants and
the replicate-then-normalize rule cannot drift between train and serve.
"""

from __future__ import annotations

import jax.numpy as jnp

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)


def make_input_norm(imagenet_norm: bool):
    """(B,H,W,C) -> normalized (B,H,W,3) when on; identity when off."""
    def norm(x):
        if imagenet_norm:
            if x.shape[-1] == 1:
                x = jnp.repeat(x, 3, axis=-1)
            x = (x - IMAGENET_MEAN) / IMAGENET_STD
        return x
    return norm
