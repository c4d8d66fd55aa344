#!/bin/bash
# Periodic artifact banker for session 4: the VM has now been wiped FOUR
# times; gitignored checkpoints and logs only survive if committed.  Every
# 30 min, force-add the live checkpoints + logs and commit.  Stops at
# R5_STOP_TS (the finalizer takes over from there).
set -x
cd "$(dirname "$0")/.."
STOP_TS=${R5_STOP_TS:?need R5_STOP_TS}
while [ "$(date +%s)" -lt "$STOP_TS" ]; do
  sleep 1800
  git add -f checkpoints/plas900_r4.ckpt checkpoints/plas900_r4.state \
          checkpoints/ns_flagship_r5.ckpt checkpoints/ns_flagship_r5.state \
          checkpoints/ns3d_r5.ckpt checkpoints/ns3d_r5.state 2>/dev/null
  for f in sequential_checkpoints/encoder_w64_ep80.ckpt \
           sequential_checkpoints/sequen_merged_w64.ckpt \
           sequential_checkpoints/encoder16_r5.ckpt \
           sequential_checkpoints/sequen_merged16_r5.ckpt \
           sequential_checkpoints/slice_slice_learner_r5.ckpt \
           sequential_checkpoints/slice_vorticity_r5.ckpt; do
    [ -f "$f" ] && git add -f "$f" 2>/dev/null
  done
  git add logs/ results/ 2>/dev/null
  git diff --cached --quiet || \
    git commit -q -m "Bank in-flight session-4 checkpoints and logs" || true
done
echo R5D_BANKER_DONE
