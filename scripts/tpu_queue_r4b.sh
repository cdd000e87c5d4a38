#!/bin/sh
# Round-4 second on-chip queue (run after verify_r4b drains):
#   1. int8 throughput retry (two prior attempts hit relay congestion;
#      probe budget now 600 s)
#   2. train-step sweep NEW cases (b64/b128 batch scaling + bf16 slice
#      store) — the r4 MFU gap analysis levers
#   3. REAL-data training run artifact (runs/fastmri_unet_realdata)
#
# Run:  nohup sh scripts/tpu_queue_r4b.sh > /tmp/tpu_queue_r4b.log 2>&1 &
set -x
cd /root/repo

timeout 2400 python scripts/measure_int8.py > /tmp/int8_r4b.log 2>&1

timeout 3600 python scripts/sweep_train_step.py > /tmp/sweep_r4b.log 2>&1

timeout 1800 python scripts/train_real_panels.py > /tmp/realpanels.log 2>&1

echo QUEUE_R4B_DONE
