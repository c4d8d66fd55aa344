#!/bin/bash
# Round-3c orchestrator (post-reboot): wait for the dual-mode NS dataset
# regeneration (scripts/gen_ns_fno_dual.py, the relay's only client) to
# land the s1200 caches, then run the two-client chain:
#
#   client 1: r3b flagship (pointwise regime, 400-epoch OneCycle) + f32 eval
#   client 2: r3c accuracy queue (darcy-hires-500, latent chain, pipe500,
#             elas4x, plas900, airfoil)
#   then:     perf tail (fwd/bwd ratio, unroll/remat probes, bench) on the
#             otherwise-idle chip
#
#   R3C_STOP_TS  hard unix-time deadline for everything (default +9.5 h).
set -x
cd "$(dirname "$0")/.."
mkdir -p logs
STOP=${R3C_STOP_TS:-$(( $(date +%s) + 34200 ))}

# 1. wait for the NS regen to produce the benchmark caches (both modes)
while [ ! -f data/synthetic/ns_v1e-5_fnopw_s1200_t20_r64.npz ] \
   || [ ! -f data/synthetic/ns_v1e-5_fno_s1200_t20_r64.npz ]; do
  # if the generator died, restart it (chunk-resumable)
  if ! kill -0 "$(cat /tmp/gen_ns.pid 2>/dev/null)" 2>/dev/null; then
    echo "NS generator not running; relaunching"
    nohup python scripts/gen_ns_fno_dual.py >> logs/gen_ns_dual.log 2>&1 &
    echo $! > /tmp/gen_ns.pid
  fi
  sleep 120
  [ "$(date +%s)" -ge "$STOP" ] && { echo R3C_TIMEOUT_WAITING_DATA; exit 1; }
done
echo "NS caches ready: $(date)"

# 2. flagship as client 1 (background); cap so the f32 eval + perf tail fit
left=$(( STOP - $(date +%s) ))
train=$(( left - 4200 ))
[ "$train" -gt 23400 ] && train=23400
FLAGSHIP_BUDGET_S=$train nohup bash scripts/flagship_ns_r3b.sh \
  >> logs/flagship_r3b_driver.log 2>&1 &
echo $! > /tmp/flagship_r3b.pid

# 3. accuracy queue as client 2 (foreground; ends before the perf tail)
ENDGAME_STOP_TS=$(( STOP - 2400 )) bash scripts/r3c_queue.sh \
  >> logs/r3c_queue.log 2>&1

# 4. wait for the flagship chain to release the relay
while kill -0 "$(cat /tmp/flagship_r3b.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
  [ "$(date +%s)" -ge "$STOP" ] && { echo R3C_TIMEOUT_FLAGSHIP; exit 1; }
done

# 5. perf tail on the idle chip
ENDGAME_STOP_TS=$STOP bash scripts/r3_perf_tail.sh >> logs/r3_perf_tail.log 2>&1
echo R3C_CHAIN_DONE
