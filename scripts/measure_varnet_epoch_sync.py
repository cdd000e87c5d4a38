"""A/B the VarNet epoch loop's loss-sync strategy on the real chip.

The r4 step benchmark (measure_varnet_slope.py) pipelines 8 steps and
syncs once — but train_one_epoch used to float(loss) EVERY step, adding a
device->host round-trip (~18 ms on this relay) that cannot overlap the
next step's host work. This measures real epoch wall time per step for:
  deferred : the shipped loop (device scalars, sync 4 behind the head)
  per_step : the old behavior (float() after every step)

Config: protocol-ish 10-cascade 320x320 12-coil bf16, batch 1, in-memory
synthetic samples (no h5 I/O — isolates the sync effect).

MEASURED RESULT (r4, this environment): deferred 2568.5 vs per-step
2470.0 ms/step — NEUTRAL, because the step is operand-UPLOAD-bound here:
each step ships ~70 MB of fresh kspace+espirit over the ~33 MB/s relay
link (~2.1 s), which dwarfs both the 85 ms device step and the ~18 ms
sync. The deferred-sync loop is kept because it strictly removes a
blocking round-trip (it matters on real PCIe/DMA hosts where upload is
~7 ms/step and the sync would be ~20% of the step), but no speedup is
claimed for this relay.

Run: nohup python scripts/measure_varnet_epoch_sync.py > /tmp/varnet_sync.log 2>&1 &
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from mri_acl_imagesegmentation_adsp_tpu.utils.compile_cache import (
    enable_compilation_cache)
enable_compilation_cache()

import jax
import jax.numpy as jnp

from mri_acl_imagesegmentation_adsp_tpu.train.varnet_trainer import (
    VarNetArgs, VarNetTrainer)

C, A, H, W = 12, 3, 320, 320
N_SAMPLES = 12


class _Sample:
    def __init__(self, rng):
        self.kspace = (rng.standard_normal((C, A, H, W, 2)) * 0.1
                       ).astype(np.float32)
        self.espirit = rng.standard_normal((C, A, H, W, 2)).astype(np.float32)
        self.target = rng.standard_normal((H, W)).astype(np.float32)
        self.max_value = 1.0
        self.fname = "synthetic.h5"
        self.slice_num = 0


def run_epochs(tr, ds, n=2):
    tr.train_ds = ds
    t0 = time.perf_counter()
    for _ in range(n):
        tr.train_one_epoch()
    dt = time.perf_counter() - t0
    return dt / (n * len(ds)) * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    ds = [_Sample(rng) for _ in range(N_SAMPLES)]
    args = VarNetArgs(out_dir="/tmp/varnet_sync_run", num_cascades=10,
                      sens_chans=8, chans=18, amp=True, epochs=1)
    tr = VarNetTrainer(args, train_ds=ds, val_ds=[])

    # warm up the compile
    tr.train_ds = ds[:2]
    tr.train_one_epoch()

    ms_deferred = run_epochs(tr, ds)
    print(f"deferred sync: {ms_deferred:.1f} ms/step", flush=True)

    orig = tr._step_batch
    tr._step_batch = lambda batch: float(orig(batch))   # old behavior
    ms_per_step = run_epochs(tr, ds)
    print(f"per-step sync: {ms_per_step:.1f} ms/step", flush=True)
    print(f"speedup: {ms_per_step / ms_deferred:.3f}x", flush=True)


if __name__ == "__main__":
    main()
