#!/bin/bash
# One strictly-sequential chip session: bench (Q1 ladder + Q3), then
# micro benches, then roofline. Never overlaps device clients; never
# kills mid-run (the tunnel holds the device 10-15 min after any kill).
set -u
cd /root/repo
echo "=== bench.py ($(date -u +%H:%M:%S)) ==="
ARROW_TPU_BENCH_TOTAL_BUDGET=${BENCH_BUDGET:-3400} ARROW_TPU_BENCH_WAIT_DEVICE=off \
  timeout ${BENCH_TIMEOUT:-3500} python bench.py 2>/dev/null
echo "=== bench_micro ($(date -u +%H:%M:%S)) ==="
timeout 1500 python bench_micro.py 2>/dev/null | tee /tmp/bench_micro_r03.jsonl
echo "=== roofline ($(date -u +%H:%M:%S)) ==="
timeout 1800 python bench_roofline.py 2>/dev/null | tee /tmp/roofline_r03.jsonl
echo "=== done ($(date -u +%H:%M:%S)) ==="
