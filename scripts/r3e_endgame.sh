#!/bin/bash
# Round-3e endgame (extended window after the 12h mark): keep <= 2 relay
# clients at all times (CLAUDE.md: a third hard-hangs the relay).
#
# Slot 1 is the plasticity-900 resume (launched separately,
# /tmp/plas_resume.pid).  This script owns slot 2:
#   1. when the transonic airfoil cache lands (host generator ~02:00),
#      train airfoil under TBNSS_AIRFOIL_REGIME=transonic;
#   2. afterwards (or if the cache never lands), resume the NS cache
#      extension toward 2000 sims for round 4.
#
# R3E_HARD_END: nothing starts past this and every child is timeout-bound
# to it (default 08:30 tomorrow, leaving slack before a possible 09:22
# session end).
set -x
cd "$(dirname "$0")/.."
mkdir -p logs
HARD_END=${R3E_HARD_END:-$(date -d "tomorrow 08:30" +%s)}
left() { echo $(( HARD_END - $(date +%s) )); }
done_lines() { wc -l < "$1" 2>/dev/null || echo 0; }

# 1. airfoil transonic: wait for the cache (generator is chunk-resumable;
#    if it dies the cache never appears and we fall through to step 2)
while [ ! -f data/synthetic/airfoil_tsn_n1250.npz ] \
      && [ "$(left)" -gt 3600 ]; do
  sleep 120
done
if [ -f data/synthetic/airfoil_tsn_n1250.npz ] \
   && [ "$(done_lines logs/airfoil_tsn_r3.jsonl)" -lt 150 ] \
   && [ "$(left)" -gt 1800 ]; then
  TBNSS_AIRFOIL_REGIME=transonic timeout $(( $(left) - 900 )) \
    python exp_airfoil.py \
    --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
    --n-layers 8 --batch-size 4 --slice_num 64 --max_grad_norm 0.1 \
    --epochs 150 --synth_n 1000 --surface_weight 8 \
    --resume 1 --metrics_file logs/airfoil_tsn_r3.jsonl \
    --save_name airfoil_tsn_r3 > logs/airfoil_tsn_r3.log 2>&1
  echo "airfoil-transonic exit $?"
fi

# 2. NS cache extension (round-4 banking; chunk-resumable).  Wait for the
#    plas slot to free so we never become a third client.
while kill -0 "$(cat /tmp/plas_resume.pid 2>/dev/null)" 2>/dev/null \
      && [ "$(left)" -gt 900 ]; do
  sleep 120
done
if [ "$(left)" -gt 1200 ]; then
  timeout $(( $(left) - 600 )) python scripts/gen_ns_fno_ext.py \
    --sims 2000 --deadline_ts $(( HARD_END - 600 )) \
    >> logs/gen_ns_2000.log 2>&1
  echo "ns-ext exit $?"
fi
echo R3E_ENDGAME_DONE
