#!/bin/sh
# Round-4 late-session on-chip queue (run on relay recovery):
#   1. verify_tpu over the fault-tolerance batch (serve drain, skip-existing,
#      classify/VarNet preempt+resume) — the earlier three VERIFY PASS runs
#      covered the warp rework / uint8 store / roll trim / 2-D+3-D preempt.
#   2. bench.py refresh (adds the b128 aug-off extras line).
#
# Run:  nohup sh scripts/tpu_queue_r4d.sh > /tmp/tpu_queue_r4d.log 2>&1 &
set -x
cd /root/repo

timeout 2400 python scripts/verify_tpu.py > /tmp/verify_r4d.log 2>&1
echo "VERIFY_RC=$?"

timeout 3600 python bench.py > /tmp/bench_r4d.log 2>&1
echo "BENCH_RC=$?"

echo QUEUE_R4D_DONE
