#!/bin/bash
# Round-5 periodic artifact banker: the VM has been wiped four times across
# rounds; gitignored checkpoints and logs only survive if committed.  Every
# 30 min, force-add any checkpoint touched in the last 40 min (auto-tracks
# whatever runs are live) plus logs/results, and commit.  Stops at
# R5_STOP_TS.
set -x
cd "$(dirname "$0")/.."
STOP_TS=${R5_STOP_TS:?need R5_STOP_TS}
while [ "$(date +%s)" -lt "$STOP_TS" ]; do
  sleep 1800
  find checkpoints sequential_checkpoints -type f -mmin -40 2>/dev/null \
    | while read -r f; do git add -f "$f"; done
  git add logs/ results/ docs/ 2>/dev/null
  git diff --cached --quiet || \
    git commit -q -m "Bank in-flight round-5 checkpoints and logs" || true
done
echo R5E_BANKER_DONE
