#!/bin/sh
# Round-4 on-chip work queue (run after the r3 queue drains):
#   1. fresh verify gate over the round-4 working tree (commit gate)
#   2. int8 throughput retry (r3 queue attempt hit relay congestion)
#   3. protocol-scale VarNet stability run (VERDICT r3 next #7)
#   4. headline bench refresh with the corrected MFU accounting
#
# Run:  nohup sh scripts/tpu_queue_r4.sh > /tmp/tpu_queue_r4.log 2>&1 &
set -x
cd /root/repo

timeout 1800 python scripts/verify_tpu.py > /tmp/verify_r4.log 2>&1

timeout 1800 python scripts/measure_int8.py > /tmp/int8_r4.log 2>&1

timeout 2400 python scripts/train_varnet_protocol.py \
    > /tmp/varnet_protocol.log 2>&1

timeout 3000 python bench.py > /tmp/bench_r4.log 2>&1

echo QUEUE_R4_DONE
