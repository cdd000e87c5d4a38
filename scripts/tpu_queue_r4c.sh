#!/bin/sh
# Round-4 third on-chip queue (uncontended — run alone on the relay):
#   1. int8 throughput (4th attempt; prior runs hit relay congestion)
#   2. clean full train-step sweep incl. the new b256 case (b64/remat_b32
#      numbers from r4b ran under verify contention)
#   3. preprocess overlap proof (serial vs pipelined, VERDICT weak #5)
#   4. b128 epoch-scan HLO attribution
#
# Run:  nohup sh scripts/tpu_queue_r4c.sh > /tmp/tpu_queue_r4c.log 2>&1 &
set -x
cd /root/repo

timeout 2400 python scripts/measure_int8.py > /tmp/int8_r4c.log 2>&1

timeout 3600 python scripts/sweep_train_step.py > /tmp/sweep_r4c.log 2>&1

timeout 1800 python scripts/measure_preprocess_overlap.py > /tmp/pre_overlap.log 2>&1

DUMP_BATCH=128 timeout 1800 python scripts/dump_hlo_epoch.py > /tmp/dump_hlo_b128.log 2>&1

echo QUEUE_R4C_DONE
