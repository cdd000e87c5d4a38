"""BatchNorm with compute-dtype elementwise math (bf16-clean on TPU).

Why: flax ``nn.BatchNorm`` defaults to ``force_float32_reductions=True``,
which promotes the FULL-RESOLUTION tensor to float32 for the normalize
arithmetic (``y = x - mean`` with f32 running stats) before casting back.
Profiler traces of the flagship U-Net (scripts/trace_unet.py) show those f32
epilogues dominating the conv fusions: the last decoder conv at 320^2 costs
4.17 ms fused with its f32 BN+ReLU vs 1.22 ms for the bare bf16 conv.

This module is parameter- and batch_stats-compatible with nn.BatchNorm
(same names: params ``scale``/``bias``, batch_stats ``mean``/``var``, all
f32; the CLASS is also named BatchNorm so flax auto-naming produces the
same ``BatchNorm_i`` module paths — checkpoints interchange). It differs
only in how the math is staged:

  * statistics stay exact: batch mean/var are f32 reductions of the bf16
    tensor (reads bf16, accumulates f32 — never materializes an f32 copy),
    identical to flax's fast-variance formula and running-stat update;
  * the full-resolution elementwise work folds stats+affine into
    per-channel A = scale * rsqrt(var + eps), B = bias - mean * A
    (computed in f32 on (C,) vectors) and applies y = x * A + B in the
    COMPUTE dtype, halving the epilogue bytes;
  * a custom VJP keeps the (C,)-parameter gradients f32-accurate: dA/dB
    are f32-accumulated reductions of bf16 operands (again fused, no f32
    materialization), while dx stays in the compute dtype.

In f32 (CPU tests) this is numerically the plain BN up to fp reassociation
(pinned in tests/test_models.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


@jax.custom_vjp
def _scale_shift(x, a, b):
    """y = x * a + b elementwise over the last axis, in x.dtype."""
    return x * a.astype(x.dtype) + b.astype(x.dtype)


def _scale_shift_fwd(x, a, b):
    return _scale_shift(x, a, b), (x, a)


def _scale_shift_bwd(res, g):
    x, a = res
    axes = tuple(range(x.ndim - 1))
    dx = (g * a.astype(g.dtype)).astype(x.dtype)
    # f32-accumulated parameter grads (bf16 sums over millions of pixels
    # would lose the mantissa)
    da = jnp.sum(g.astype(jnp.float32) * x.astype(jnp.float32), axis=axes)
    db = jnp.sum(g.astype(jnp.float32), axis=axes)
    return dx, da.astype(a.dtype), db.astype(a.dtype)


_scale_shift.defvjp(_scale_shift_fwd, _scale_shift_bwd)


class BatchNorm(nn.Module):
    """Drop-in nn.BatchNorm replacement (see module docstring).

    Only the configuration surface this package uses is implemented:
    feature axis -1, use_bias/use_scale on, fast variance, no axis_name
    (cross-device stats come from GSPMD-sharded batch reductions).
    """
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    # >1 when the input is a space-to-depth phase-major tensor whose last
    # axis is (phase_groups * C): parameters/stats stay per LOGICAL channel
    # C (so the tree matches the high-res layout and checkpoints
    # interchange), batch statistics additionally reduce over the phase
    # groups (same value set as the high-res reduction), and A/B are tiled
    # phase-major for the elementwise apply.
    phase_groups: int = 1

    @nn.compact
    def __call__(self, x):
        g = self.phase_groups
        feat = x.shape[-1] // g
        scale = self.param("scale", nn.initializers.ones, (feat,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (feat,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (feat,))

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            if g > 1:
                xf = xf.reshape(*x.shape[:-1], g, feat)
            axes = tuple(range(xf.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            mu2 = jnp.mean(jnp.square(xf), axis=axes)
            var = jnp.maximum(0.0, mu2 - jnp.square(mean))
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var

        a = scale * lax.rsqrt(var + self.epsilon)
        b = bias - mean * a
        if g > 1:
            a, b = jnp.tile(a, g), jnp.tile(b, g)
        return _scale_shift(x.astype(self.dtype), a, b)
