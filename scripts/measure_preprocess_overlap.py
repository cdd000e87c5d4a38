"""Prove (or falsify) upload/compute/download OVERLAP in the pipelined
corpus preprocess path on the real chip.

VERDICT r3 weak #5: the sustained corpus rate is link-bound (~10-12
slices/s over the ~33 MB/s relay) and the round-robin ``devices=`` path
"distributes placement rather than proving overlapped
upload/compute/download on one chip". This script measures exactly that
on ONE chip:

  serial    — per volume: upload, dispatch, np.asarray (drain) before the
              next volume starts. No overlap by construction.
  pipelined — preprocess_volumes_pairs: every volume's upload + chain is
              enqueued before any result is drained (data/preprocess.py).

If the async dispatch pipeline really overlaps the ~190 slices/s device
compute with the link transfers, pipelined wall-clock ~= max(link, compute)
while serial ~= link + compute (+ download), so the ratio quantifies the
overlap. Results are asserted identical between the two paths.

Run: nohup python scripts/measure_preprocess_overlap.py > /tmp/pre_overlap.log 2>&1 &
"""
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

VOLS = 6
S, H, W = 36, 640, 368     # protocol-ish k-space slab per volume


def main() -> int:
    import jax

    from mri_acl_imagesegmentation_adsp_tpu.data.preprocess import (
        MRIKneePreprocessor)

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    pairs = [rng.standard_normal((S, H, W, 2)).astype(np.float32)
             for _ in range(VOLS)]
    mb = pairs[0].nbytes / 1e6
    pp = MRIKneePreprocessor(slice_keep=(0.0, 1.0), out_size=(320, 320))

    # warm both programs (compile once, not inside the timed regions)
    pp.preprocess_volumes_pairs([pairs[0]])

    def run_serial():
        outs = []
        for p in pairs:
            o = pp.preprocess_volume_pairs(p)     # drains per volume
            outs.append(np.asarray(o["tensor"]))
        return outs

    def run_pipelined():
        outs = pp.preprocess_volumes_pairs(pairs)
        return [np.asarray(o["tensor"]) for o in outs]

    t0 = time.perf_counter()
    serial = run_serial()
    t_serial = time.perf_counter() - t0

    t0 = time.perf_counter()
    piped = run_pipelined()
    t_piped = time.perf_counter() - t0

    for a, b in zip(serial, piped):
        np.testing.assert_array_equal(a, b)

    n_slices = VOLS * S
    print(f"volume upload {mb:.1f} MB x {VOLS}")
    print(f"serial:    {t_serial:.1f} s = {n_slices / t_serial:.2f} slices/s")
    print(f"pipelined: {t_piped:.1f} s = {n_slices / t_piped:.2f} slices/s")
    print(f"overlap speedup: {t_serial / t_piped:.2f}x "
          f"(results identical)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
