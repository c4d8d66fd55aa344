#!/bin/bash
# Session-4 finalizer: at R5_STOP_TS, stop both relay clients (the
# driver's end-of-round bench must not become a 3rd client -- CLAUDE.md
# relay rule), bank everything, and run one warm bench so BENCH_r05 hits
# a hot compile cache.
set -x
cd "$(dirname "$0")/.."
STOP_TS=${R5_STOP_TS:?need R5_STOP_TS}
while [ "$(date +%s)" -lt "$STOP_TS" ]; do sleep 20; done

kill_tree() { # children first, then pid
  local p=$1
  [ -z "$p" ] && return
  for c in $(ps -o pid= --ppid "$p" 2>/dev/null); do kill_tree "$c"; done
  kill "$p" 2>/dev/null
}

for f in /tmp/r5d_c1.pid /tmp/r5d_c2.pid /tmp/flagship_r5.pid; do
  kill_tree "$(cat "$f" 2>/dev/null)"
done
sleep 20

git add -f checkpoints/plas900_r4.ckpt checkpoints/plas900_r4.state \
        checkpoints/ns_flagship_r5.ckpt checkpoints/ns_flagship_r5.state \
        checkpoints/ns3d_r5.ckpt 2>/dev/null
for f in sequential_checkpoints/*.ckpt; do
  [ -f "$f" ] && git add -f "$f" 2>/dev/null
done
git add logs/ results/ 2>/dev/null
git commit -q -m "Session-4 endgame: stop relay clients, bank checkpoints and final logs" || true

# decisive data point for the padded-mega NaN: real plas weights, compiled
# Mosaic (CPU interpret PASSes, logs/probe_mega_real_cpu.log) -- run in
# this exclusive window so it is never a 3rd relay client
timeout 1200 python tools/probe_mega_real_weights.py \
  > logs/probe_mega_real_tpu.log 2>&1
echo "PROBE_REAL_TPU_EXIT $?"
git add logs/probe_mega_real_tpu.log 2>/dev/null
git commit -q -m "TPU real-weights padded-mega probe result" || true

timeout 1800 python bench.py > logs/bench_r5d_warm.json 2> logs/bench_r5d_warm.log
echo "BENCH_WARM_EXIT $?" >> logs/bench_r5d_warm.log
git add logs/bench_r5d_warm.json logs/bench_r5d_warm.log 2>/dev/null
git commit -q -m "Warm bench probe before driver bench" || true
echo R5D_FINALIZE_DONE
