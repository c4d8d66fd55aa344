#!/bin/bash
# Round-5 client-2 queue: padded-mega NaN evidence chain (VERDICT r4 #1).
#
# 1. Replay the pinned epoch-21 plasticity trajectory under PRE-FIX
#    numerics (TBNSS_SEG_DOT_UNSAFE=1) and dump the exact failing
#    (params, batch) at update 1973.
# 2. Dissect the dumped case: pre-fix mega forward must NaN, fixed mega
#    and XLA must be finite (+ slice-logit magnitudes for the overflow
#    hypothesis).
# 3. Acceptance: full 2260-update replay under the FIXED mega — must stay
#    finite end-to-end.
# 4. XLA replay of the identical schedule for the loss-trajectory
#    comparison.
set -x
cd "$(dirname "$0")/.."

timeout 3600 env TBNSS_SEG_DOT_UNSAFE=1 TBNSS_MEGA_PADDED=1 \
  python tools/probe_mega_nan_bisect.py --dump-at 1973 \
  --state checkpoints/plas900_ep21_repro.state \
  > logs/r5f_nan_dump.log 2>&1
echo DUMP_EXIT $?

if [ -f tools/_nan_case.npz ]; then
  timeout 1800 env TBNSS_SEG_DOT_UNSAFE=1 TBNSS_MEGA_PADDED=1 \
    python tools/probe_mega_nan_dissect.py \
    > logs/r5f_nan_dissect_prefix.log 2>&1
  echo DISSECT_PREFIX_EXIT $?
  timeout 1800 env TBNSS_MEGA_PADDED=1 \
    python tools/probe_mega_nan_dissect.py \
    > logs/r5f_nan_dissect_fixed.log 2>&1
  echo DISSECT_FIXED_EXIT $?
fi

timeout 3600 env TBNSS_MEGA_PADDED=1 \
  python tools/probe_mega_nan_bisect.py \
  --state checkpoints/plas900_ep21_repro.state \
  > logs/r5f_nan_replay_fixed.log 2>&1
echo REPLAY_FIXED_EXIT $?

timeout 3600 env TBNSS_MEGA_PADDED=1 \
  python tools/probe_mega_nan_bisect.py --impl xla \
  --state checkpoints/plas900_ep21_repro.state \
  > logs/r5f_nan_replay_xla.log 2>&1
echo REPLAY_XLA_EXIT $?
echo R5F_NAN_QUEUE_DONE
