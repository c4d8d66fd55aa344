#!/bin/bash
# Round-3 TPU watchdog: the axon relay process died mid-round (3-client
# hang incident, 20:0x).  If the platform tunnel comes back, resume the
# flagship training chain with whatever budget remains, then the endgame
# queue.  WATCHDOG_STOP_TS bounds everything.
set -x
cd "$(dirname "$0")/.."
STOP=${WATCHDOG_STOP_TS:-$(( $(date +%s) + 7200 ))}

while [ "$(date +%s)" -lt "$STOP" ]; do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
x = jnp.ones((128, 128)); print(float((x @ x).sum()))
" > /dev/null 2>&1; then
    echo "TPU BACK: $(date)"
    left=$(( STOP - $(date +%s) ))
    train=$(( left - 2400 ))
    if [ "$train" -gt 600 ]; then
      FLAGSHIP_BUDGET_S=$train nohup bash scripts/flagship_ns_r3.sh \
        >> logs/flagship_r3_driver.log 2>&1 &
      echo $! > /tmp/flagship_r3.pid
    else
      # no time to train: just refresh the pid file with a no-op so the
      # endgame's wait loop passes
      sleep 1 & echo $! > /tmp/flagship_r3.pid
    fi
    ENDGAME_STOP_TS=$(( STOP )) bash scripts/r3_endgame.sh \
      >> logs/r3_endgame_driver.log 2>&1
    echo WATCHDOG_CHAIN_DONE
    exit 0
  fi
  sleep 180
done
echo WATCHDOG_TIMEOUT
