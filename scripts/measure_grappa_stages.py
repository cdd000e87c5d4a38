"""Stage breakdown of the T2 GRAPPA bench case on the TPU: host prep,
upload, weight solves, apply+iFFT+crop, download.

Run:  nohup python scripts/measure_grappa_stages.py > /tmp/grappa_stages.log 2>&1 &
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from mri_acl_imagesegmentation_adsp_tpu.utils.compile_cache import (
    enable_compilation_cache)
enable_compilation_cache()

import jax
import jax.numpy as jnp

from mri_acl_imagesegmentation_adsp_tpu.recon.grappa import Grappa
from mri_acl_imagesegmentation_adsp_tpu.recon.t2 import t2_reconstruction
from mri_acl_imagesegmentation_adsp_tpu.ops.cpair import to_pair

SLICES, COILS, RO, PE = 10, 20, 640, 368


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    def cplx(shape):
        return (rng.standard_normal(shape)
                + 1j * rng.standard_normal(shape)).astype(np.complex64)

    k = cplx((3, SLICES, COILS, RO, PE))
    mask = np.zeros(PE, bool)
    mask[::3] = True
    k[..., ~mask] = 0
    calib = cplx((SLICES, COILS, RO, 32))

    # full pipeline, warm
    np.asarray(t2_reconstruction(k, calib)["reconstruction_rss"])
    t0 = time.perf_counter()
    np.asarray(t2_reconstruction(k, calib)["reconstruction_rss"])
    t1 = time.perf_counter()
    print(f"full t2_reconstruction warm: {t1-t0:.1f} s "
          f"({(t1-t0)/SLICES:.2f} s/slice)", flush=True)

    # stage: zero-copy upload (contiguous complex buffer viewed as pairs)
    from mri_acl_imagesegmentation_adsp_tpu.ops.cpair import to_pair_device
    nbytes = k.nbytes
    t0 = time.perf_counter()
    k_pair0 = to_pair_device(np.ascontiguousarray(k))
    np.asarray(k_pair0[0, 0, 0, 0, 0])
    t1 = time.perf_counter()
    print(f"zero-copy upload {nbytes/1e6:.0f} MB: {t1-t0:.1f} s "
          f"= {nbytes/1e6/(t1-t0):.1f} MB/s", flush=True)
    k_pair = jnp.transpose(k_pair0, (0, 1, 4, 2, 3, 5))

    # stage: weights (batched)
    g1 = Grappa(np.transpose(k[0, 0], (2, 0, 1)), kernel_size=(5, 5),
                coil_axis=1)
    calib_stack = np.transpose(calib, (0, 3, 1, 2))
    g1.compute_weights_batch(calib_stack)  # warm
    t0 = time.perf_counter()
    wd = g1.compute_weights_batch(calib_stack)
    t1 = time.perf_counter()
    print(f"weights batched ({SLICES} slices): {t1-t0:.1f} s", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
