#!/bin/bash
# Round-4 accuracy queue (VERDICT items 1/3/6): fires each training run as
# its data cache completes, restartable after session deaths/VM wipes.
# Relay discipline (CLAUDE.md): <= 2 chip clients at any moment.  The NS
# dual generator is a client until its 19 chunks land; plasticity training
# is the second; the flagship replaces the generator; elas-iface training
# replaces plasticity.  Every trainer is --resume 1 and each phase skips
# itself when its sentinel (DONE line in the log) is already present.
set -x
cd "$(dirname "$0")/.."
mkdir -p logs checkpoints
DEADLINE=$(( $(date +%s) + ${R4_BUDGET_S:-39600} ))
left() { echo $(( DEADLINE - $(date +%s) )); }

wait_for() { # wait_for <what> <test-cmd...>
  local what=$1; shift
  until "$@"; do
    [ "$(left)" -le 300 ] && { echo "R4_DEADLINE waiting for $what"; exit 1; }
    sleep 60
  done
}

plas_cache_ready() { python - <<'EOF'
import glob, os, sys
final = "data/synthetic/plas_fem_n1125.npz"
parts = glob.glob("data/synthetic/plas_fem_n1125.part*.npz")
sys.exit(0 if (os.path.exists(final) or len(parts) >= 45) else 1)
EOF
}

ns_bank_ready() { python - <<'EOF'
import glob, sys
a = len(glob.glob("data/synthetic/chunks/ns_fno_1200_*.npy"))
b = len(glob.glob("data/synthetic/chunks/ns_fnopw_1200_*.npy"))
sys.exit(0 if (a >= 19 and b >= 19) else 1)
EOF
}

run_until_done() { # run_until_done <log> <target-epochs> <cmd...>
  local log=$1 target=$2; shift 2
  local zero=0
  while :; do
    local l; l=$(left)
    [ "$l" -le 180 ] && { echo "R4_DEADLINE $log"; return 1; }
    local cap=$(( l < 5400 ? l : 5400 ))
    local e0; e0=$(wc -l < "$log" 2>/dev/null || echo 0)
    timeout "$cap" "$@" >> "${log%.jsonl}.log" 2>&1
    local code=$?
    local e1; e1=$(wc -l < "$log" 2>/dev/null || echo 0)
    echo "run $log exit $code epochs $e0->$e1"
    [ "$code" -eq 0 ] && return 0
    [ "$e1" -ge "$target" ] && return 0
    if [ "$e1" -le "$e0" ]; then
      zero=$(( zero + 1 )); [ "$zero" -ge 3 ] && { echo "R4_STUCK $log"; return 1; }
    else zero=0; fi
  done
}

# ---- phase 1: plasticity-900, full 100-epoch schedule (VERDICT item 3) ----
if ! grep -q PLAS_R4_DONE logs/r4_queue_state 2>/dev/null; then
  wait_for plas_cache plas_cache_ready
  # --impl xla: the padded-tail megakernel's slice-param grads are under
  # investigation on real TPU at 101x31 (probe r4); train on the verified
  # XLA block until the parity probe is clean
  run_until_done logs/plas900_r4.jsonl 100 python exp_plas.py \
    --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
    --n-layers 8 --batch-size 8 --slice_num 64 --max_grad_norm 0.1 \
    --epochs 100 --synth_n 900 --channel_weighted 1 --impl xla \
    --resume 1 --metrics_file logs/plas900_r4.jsonl --save_name plas900_r4 \
    && echo PLAS_R4_DONE >> logs/r4_queue_state
fi

# ---- phase 2: elasticity near-interface retrain (VERDICT item 6) ----
if ! grep -q ELAS_IFACE_DONE logs/r4_queue_state 2>/dev/null; then
  wait_for elas_iface test -f data/synthetic/elas_fem_iface_n5000.npz
  TBNSS_ELAS_SAMPLING=iface run_until_done logs/elas_iface_r4.jsonl 400 \
    python exp_elas.py \
    --model Transolver_Irregular_Mesh --n-hidden 128 --n-heads 8 \
    --n-layers 8 --batch-size 8 --slice_num 64 --max_grad_norm 0.1 \
    --epochs 400 --ntrain 4000 --synth_n 4000 \
    --resume 1 --metrics_file logs/elas_iface_r4.jsonl \
    --save_name elas_iface_r4 \
    && echo ELAS_IFACE_DONE >> logs/r4_queue_state
fi

echo R4_QUEUE_DONE
