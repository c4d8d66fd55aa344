#!/bin/bash
# Round-3b TPU watchdog: the axon relay died mid-round (3-client incident)
# and has stayed down.  Poll for it; when (if) it returns, run the full
# remaining round-3 chain:
#
#   client 1: flagship NS resume (ep97 -> 250, ~38 s/epoch => ~2 h)
#   client 2: accuracy queue (plas-900, merged-400, airfoil, elas-4x)
#   then:     perf tail (fwd/bwd ratio, unroll probes, bench) on the
#             otherwise-idle chip
#
#   WATCHDOG_STOP_TS  hard unix-time deadline for everything.
set -x
cd "$(dirname "$0")/.."
mkdir -p logs
STOP=${WATCHDOG_STOP_TS:-$(( $(date +%s) + 36000 ))}

while [ "$(date +%s)" -lt "$STOP" ]; do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
x = jnp.ones((128, 128)); print(float((x @ x).sum()))
" > /dev/null 2>&1; then
    echo "TPU BACK: $(date)"
    left=$(( STOP - $(date +%s) ))
    # flagship needs ~2 h of epochs + one ~15 min cold compile + f32 eval;
    # cap at 4 h so the perf tail always gets chip time before STOP
    train=$(( left - 2700 ))
    [ "$train" -gt 14400 ] && train=14400
    if [ "$train" -gt 600 ]; then
      FLAGSHIP_BUDGET_S=$train nohup bash scripts/flagship_ns_r3.sh \
        >> logs/flagship_r3_driver.log 2>&1 &
      echo $! > /tmp/flagship_r3.pid
    else
      sleep 1 & echo $! > /tmp/flagship_r3.pid
    fi
    # accuracy queue as the SECOND client, concurrent with the flagship
    ENDGAME_STOP_TS=$(( STOP - 1500 )) bash scripts/r3_accuracy_queue.sh \
      >> logs/r3_accuracy_queue.log 2>&1
    # wait for the flagship to release the relay before the perf tail
    while kill -0 "$(cat /tmp/flagship_r3.pid 2>/dev/null)" 2>/dev/null; do
      sleep 60
      [ "$(date +%s)" -ge "$STOP" ] && { echo WATCHDOG_TIMEOUT_FLAGSHIP; exit 1; }
    done
    ENDGAME_STOP_TS=$STOP bash scripts/r3_perf_tail.sh \
      >> logs/r3_perf_tail.log 2>&1
    echo WATCHDOG_CHAIN_DONE
    exit 0
  fi
  sleep 180
done
echo WATCHDOG_TIMEOUT
