#!/bin/bash
# Round-5 finalizer: at STOP_TS, stop all relay clients (the driver's
# end-of-round bench must not be a 3rd client — CLAUDE.md relay rule),
# bank checkpoints + final logs, commit, and run one warm bench so
# BENCH_r05 hits a hot compile cache.
set -x
cd "$(dirname "$0")/.."
STOP_TS=${R5_STOP_TS:?need R5_STOP_TS}
while [ "$(date +%s)" -lt "$STOP_TS" ]; do sleep 20; done

kill_tree() { # kill_tree <pid>: children first, then pid
  local p=$1
  [ -z "$p" ] && return
  for c in $(ps -o pid= --ppid "$p" 2>/dev/null); do kill_tree "$c"; done
  kill "$p" 2>/dev/null
}

for f in /tmp/r5b_c1.pid /tmp/r5c_c1.pid /tmp/r5c_c2.pid /tmp/flagship_r5.pid; do
  kill_tree "$(cat "$f" 2>/dev/null)"
done
sleep 20

git add -f checkpoints/plas900_r4.ckpt checkpoints/plas900_r4.state \
        checkpoints/ns_flagship_r5.ckpt checkpoints/ns_flagship_r5.state \
        checkpoints/ns3d_r5.ckpt checkpoints/elas_iface_r5.ckpt \
        checkpoints/airfoil_tsn_r5.ckpt \
        sequential_checkpoints/*.ckpt 2>/dev/null
git add logs/ results/ 2>/dev/null
git commit -q -m "r5 endgame: stop relay clients, bank checkpoints and final logs" || true

# one warm bench so the driver's BENCH_r05 run compiles from cache
timeout 1800 python bench.py > logs/bench_r5_warm.json 2> logs/bench_r5_warm.log
echo "BENCH_WARM_EXIT $?" >> logs/bench_r5_warm.log
git add logs/bench_r5_warm.json logs/bench_r5_warm.log 2>/dev/null
git commit -q -m "r5: warm bench probe before driver bench" || true
echo R5_FINALIZE_DONE
