#!/bin/bash
# Retry loop for chip_session_r5.py: a watchdog_exit (code 3) or crash
# restarts the session after a tunnel cooldown; already-banked metrics
# are skipped on re-entry (the script reads CHIP_SESSION_r05.jsonl).
set -u
cd "$(dirname "$0")"
BUDGET_TOTAL=${CHIP_BUDGET_TOTAL:-7200}
T0=$(date +%s)
for attempt in 1 2 3 4; do
  left=$((BUDGET_TOTAL - ($(date +%s) - T0)))
  if [ "$left" -lt 600 ]; then
    echo "{\"phase\": \"loop_out_of_budget\", \"attempt\": $attempt}"
    break
  fi
  CHIP_BUDGET=$left python -u chip_session_r5.py
  rc=$?
  echo "{\"phase\": \"attempt_exit\", \"attempt\": $attempt, \"rc\": $rc}"
  if [ "$rc" -eq 0 ]; then
    break
  fi
  sleep 120
  for probe in 1 2 3 4 5 6; do
    timeout 90 python -c "
import jax, numpy as np
d = jax.device_put(np.ones(1 << 17))
assert float(np.asarray(d[:1])[0]) == 1.0
print('DEVICE_READY')" && break
    sleep 60
  done
done
