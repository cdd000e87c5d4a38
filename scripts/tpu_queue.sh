#!/bin/sh
# Queued on-chip measurements waiting for the TPU relay to return
# (outage began ~Aug 17 19:30; see ROADMAP.md round-3 notes). Runs the
# highest-value items first so a flaky relay still yields the headline
# numbers. Each script is self-contained and logs under /tmp.
#
# Run:  nohup sh scripts/tpu_queue.sh > /tmp/tpu_queue.log 2>&1 &
set -x
cd /root/repo

# 1. Train-step sweep: accum4 / remat / b32 cases (VERDICT r2 #2 — the
#    >=800 slices/s aug-light target; attributes the 11.1 ms b8 budget).
timeout 2400 python scripts/sweep_train_step.py > /tmp/sweep_step.log 2>&1

# 2. Full TPU verification gate (~8 min when relay is healthy).
timeout 1800 python scripts/verify_tpu.py > /tmp/verify_tpu.log 2>&1

# 3. Headline bench refresh (has its own 40-min watchdog).
timeout 3000 python bench.py > /tmp/bench_r3.log 2>&1

# 4. int8 serving throughput vs bf16.
timeout 1800 python scripts/measure_int8.py > /tmp/int8.log 2>&1

# 5. Serving daemon HTTP throughput/latency (segment + kspace series).
timeout 1800 python scripts/measure_serve.py > /tmp/measure_serve.log 2>&1

echo QUEUE_DONE
