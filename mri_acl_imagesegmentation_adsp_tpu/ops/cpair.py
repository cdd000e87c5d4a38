"""Complex arithmetic on real-pair (..., 2) arrays.

Parity target: vendored DL_reconstruction/math_fn.py:12-99 (complex_mul /
complex_conj / complex_abs / complex_abs_sq on (..., 2) tensors — the
fastMRI real-pair convention). On this TPU backend complex dtypes are
unavailable, so these are THE complex primitives of the device path
(ops/fftc.py, recon/grappa.py, recon/varnet.py build on them).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def cmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a_re + i a_im)(b_re + i b_im) on (..., 2) pairs."""
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    return jnp.stack([ar * br - ai * bi, ar * bi + ai * br], axis=-1)


def cconj(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([a[..., 0], -a[..., 1]], axis=-1)


def cabs(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(a[..., 0] ** 2 + a[..., 1] ** 2)


def cabs_sq(a: jnp.ndarray) -> jnp.ndarray:
    return a[..., 0] ** 2 + a[..., 1] ** 2


def cmatmul(a: jnp.ndarray, b: jnp.ndarray,
            precision=lax.Precision.HIGHEST) -> jnp.ndarray:
    """Complex matmul of pair matrices: (..., M, K, 2) @ (..., K, N, 2)."""
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    mm = lambda x, y: jnp.matmul(x, y, precision=precision)
    return jnp.stack([mm(ar, br) - mm(ai, bi),
                      mm(ar, bi) + mm(ai, br)], axis=-1)


def csolve(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A X = B for pair matrices A (N,N,2), B (N,M,2).

    Uses the real block embedding [[Ar, -Ai], [Ai, Ar]] — one real solve on
    the MXU-friendly doubled system.
    """
    n = a.shape[0]
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    block = jnp.block([[ar, -ai], [ai, ar]])
    rhs = jnp.concatenate([br, bi], axis=0)
    sol = jnp.linalg.solve(block, rhs)
    return jnp.stack([sol[:n], sol[n:]], axis=-1)


def to_pair(x) -> jnp.ndarray:
    """complex (host) or real array -> (..., 2) float32 pair."""
    x = np.asarray(x) if not isinstance(x, jnp.ndarray) else x
    if np.iscomplexobj(x):
        return jnp.stack([jnp.asarray(x.real, jnp.float32),
                          jnp.asarray(x.imag, jnp.float32)], axis=-1)
    x = jnp.asarray(x, jnp.float32)
    return jnp.stack([x, jnp.zeros_like(x)], axis=-1)


def to_pair_device(x, transfer_dtype: str = None) -> jnp.ndarray:
    """Host complex/real ndarray -> DEVICE (..., 2) float32 pair with zero
    host-side copies where possible.

    complex64 memory is already interleaved (re, im), so a C-contiguous
    complex64 array IS its float32 pair array under ``.view`` — the upload
    streams the original buffer untouched. At protocol scale this matters a
    lot: the stack-based host conversion of a ~1 GB T2 case costs ~30 s of
    single-threaded NumPy before the device sees a byte (measured,
    scripts/measure_grappa_stages.py); callers should upload the contiguous
    layout and do any axis reordering ON DEVICE.

    ``transfer_dtype="bfloat16"`` rounds the pair to bf16 on host and
    upcasts to f32 on device — HALF the bytes on the host->device link, a
    bandwidth/accuracy TRADE exactly like the preprocess bf16 link path
    (data/preprocess.py preprocess_volumes_pairs): the recon chain's
    matmuls run at HIGHEST precision, so the ~0.4% relative pre-round
    error propagates instead of being absorbed (tolerance gates live with
    the callers). Default None = exact f32.
    """
    if transfer_dtype not in (None, "float32", "bfloat16"):
        raise ValueError(f"unsupported transfer_dtype {transfer_dtype!r}")

    def _up(v: np.ndarray) -> jnp.ndarray:
        if transfer_dtype == "bfloat16":
            import ml_dtypes
            return jnp.asarray(v.astype(ml_dtypes.bfloat16)
                               ).astype(jnp.float32)
        return jnp.asarray(v)

    x = np.asarray(x)
    if x.dtype == np.complex64 and x.flags.c_contiguous:
        return _up(x.view(np.float32).reshape(*x.shape, 2))
    if np.iscomplexobj(x):
        return _up(to_pair_np(x))
    x = np.asarray(x, np.float32)
    if transfer_dtype == "bfloat16":
        re = _up(x)
        return jnp.stack([re, jnp.zeros_like(re)], axis=-1)
    xj = jnp.asarray(x)
    return jnp.stack([xj, jnp.zeros_like(xj)], axis=-1)


def to_pair_np(x: np.ndarray) -> np.ndarray:
    """Host-side complex (or real) ndarray -> float32 (..., 2) pair.

    The single NumPy converter behind the adapter/preprocess/transform
    entry points (device-side code uses :func:`to_pair`)."""
    x = np.asarray(x)
    if np.iscomplexobj(x):
        return np.stack([x.real, x.imag], axis=-1).astype(np.float32)
    return np.stack([x, np.zeros_like(x)], axis=-1).astype(np.float32)


def to_complex(x: jnp.ndarray) -> np.ndarray:
    """(..., 2) pair -> host complex64 ndarray."""
    x = np.asarray(x)
    return (x[..., 0] + 1j * x[..., 1]).astype(np.complex64)
