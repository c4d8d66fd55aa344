#!/bin/bash
# Round-4 finalizer: at STOP_TS, stop all relay clients (the driver's
# end-of-round bench must not be a 3rd client -- CLAUDE.md relay rule),
# bank checkpoints + remaining airfoil chunks, commit, and run one warm
# bench so BENCH_r04 hits a hot compile cache.
set -x
cd "$(dirname "$0")/.."
STOP_TS=${R4_STOP_TS:?need R4_STOP_TS}
while [ "$(date +%s)" -lt "$STOP_TS" ]; do sleep 20; done

kill_tree() { # kill_tree <pid>: children first, then pid
  local p=$1
  [ -z "$p" ] && return
  for c in $(ps -o pid= --ppid "$p" 2>/dev/null); do kill_tree "$c"; done
  kill "$p" 2>/dev/null
}

# stop the queue (plas) and the 3D run; leave host-CPU generators alone
kill_tree 16349
kill_tree "$(cat /tmp/exp3d.pid 2>/dev/null)"
sleep 20

git add -f checkpoints/plas900_r4.ckpt checkpoints/plas900_r4.state \
        checkpoints/ns3d_r4.ckpt checkpoints/ns3d_r4b.ckpt 2>/dev/null
git add data/synthetic/chunks/airfoil_tsn_*.npz \
        logs/plas900_r4.jsonl logs/plas900_r4.log logs/host_gen_r4.log \
        logs/exp3d_r4.jsonl logs/exp3d_r4.log logs/r4_queue.log \
        logs/exp3d_r4b.jsonl logs/exp3d_r4b.log logs/r4_finalize.log \
        logs/ns_flagship_r4.jsonl logs/ns_flagship_r4.log \
        logs/r4_final_tests.log \
        2>/dev/null
git commit -q -m "r4 endgame: stop relay clients, bank checkpoints and final logs

No-Verification-Needed: run-artifact banking at round end, no source change" || true

# one warm bench so the driver's BENCH_r04 run compiles from cache
# (the batch-32 default is a fresh program post-wipe: budget a full
# 8-15 min remote compile)
timeout 1800 python bench.py > logs/bench_r4_warm.json 2> logs/bench_r4_warm.log
echo "BENCH_WARM_EXIT $?" >> logs/bench_r4_warm.log
git add logs/bench_r4_warm.json logs/bench_r4_warm.log 2>/dev/null
git commit -q -m "r4: warm bench probe before driver bench

No-Verification-Needed: log banking only" || true
echo R4_FINALIZE_DONE
