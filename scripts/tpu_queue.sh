#!/bin/sh
# Queued on-chip work waiting for the TPU relay to return.
# (r3 queue was fully drained in round 4; this is the r4c recovery list —
# the relay was down for the whole third builder session, so the session's
# changes are CPU-verified and need the standard on-chip re-validation.)
#
# Run:  nohup sh scripts/tpu_queue.sh > /tmp/tpu_queue.log 2>&1 &
set -x
cd /root/repo

# 1. Full TPU verification gate (~8 min when relay is healthy).
#    Covers the package boundary + CLI on the real chip; the session's
#    checkpoint-lifecycle changes ride the launcher path it drives.
timeout 1800 python scripts/verify_tpu.py > /tmp/verify_tpu.log 2>&1

# 2. Headline bench refresh (has its own watchdog).
timeout 3000 python bench.py > /tmp/bench_r4c.log 2>&1

echo QUEUE_DONE
