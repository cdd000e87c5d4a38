"""Measure the full DWI recon case on the real TPU.

Shapes follow the vendored prostate protocol's DWI layout
(zip!fastmri_prostate/reconstruction/dwi/prostate_dwi_recon.py): 51
averages (3x b50 directions x4, 3x b1000 x12, trace extras), R=2
undersampled EPI k-space regridded from 200 ramp samples, per-slice GRAPPA,
SENSE-combine, trace/ADC/b1500 maps. Vendored baseline: ~7 min/case on CPU
(zip!README.md).

Run:  nohup python scripts/measure_dwi.py > /tmp/measure_dwi.log 2>&1 &
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

from mri_acl_imagesegmentation_adsp_tpu.utils.compile_cache import (
    enable_compilation_cache)
enable_compilation_cache()

from mri_acl_imagesegmentation_adsp_tpu.recon.dwi import dwi_reconstruction

EPI = {"rampUpTime": 100.0, "rampDownTime": 100.0, "flatTopTime": 400.0,
       "acqDelayTime": 10.0, "echoSpacing": 1.0}
N_AVG, N_SL, N_COIL, RO, PE = 51, 8, 12, 200, 104


def case(rng):
    ksp = (rng.standard_normal((N_AVG, N_SL, N_COIL, RO, PE))
           + 1j * rng.standard_normal((N_AVG, N_SL, N_COIL, RO, PE))
           ).astype(np.complex64) * 0.1
    mask = np.zeros(PE, bool)
    mask[::2] = True
    mask[PE // 2 - 8: PE // 2 + 8] = True      # ACS band
    ksp[..., ~mask] = 0
    calib = (rng.standard_normal((N_SL, N_COIL, RO, PE))
             + 1j * rng.standard_normal((N_SL, N_COIL, RO, PE))
             ).astype(np.complex64) * 0.1
    sens = (rng.standard_normal((N_SL, N_COIL, RO, PE))
            + 1j * rng.standard_normal((N_SL, N_COIL, RO, PE))
            ).astype(np.complex64)
    return ksp, calib, sens


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    ksp, calib, sens = case(rng)
    t0 = time.perf_counter()
    out = dwi_reconstruction(ksp, calib, sens, EPI)
    t1 = time.perf_counter()
    print(f"cold case ({N_AVG} avg, {N_SL} slices, {N_COIL} coils, "
          f"{RO}x{PE}): {t1-t0:.1f} s", flush=True)
    ksp, calib, sens = case(rng)
    t0 = time.perf_counter()
    out = dwi_reconstruction(ksp, calib, sens, EPI)
    t1 = time.perf_counter()
    assert all(np.isfinite(v).all() for v in out.values())
    print(f"warm case: {t1-t0:.1f} s ({(t1-t0)/N_SL:.2f} s/slice); "
          f"keys={sorted(out)}", flush=True)
