#!/bin/bash
# Round-5 bootstrap: fire this FIRST THING in round 5.  Recovers from a
# possible fourth environment wipe (git banks restore the data estate),
# then runs the round-5 priority queue with the standing relay discipline
# (<= 2 chip clients; host generators don't count).
#
# Priority order (from VERDICT r4-era items still open):
#   A. resume plasticity-900 to the full 100-epoch schedule (banked
#      checkpoint checkpoints/plas900_r4.{ckpt,state} resumes in place)
#   B. elasticity near-interface retrain (cache banked)
#   C. transonic airfoil: finish host generation if short of 1250, then
#      train 300 epochs (THE airfoil accuracy move)
#   D. latent w64 budget study (scripts/latent_r4.sh)
#   E. NS <=0.10 attempt: needs a CHANGE vs the r3b 0.110 (2000-sim data
#      extension via scripts/gen_ns_fno_ext.py --sims 2000, or a wider
#      model) -- r3b was ALREADY pointwise (docs/ROUND_NOTES.md round 4)
#   F. FIX the masked-tail slice_kernel gradient on compiled Mosaic --
#      tools/probe_mega_param_grads.py FAILED at 101x31 on real TPU
#      (rel 0.77; input grad clean; CPU interpret passes).  Then re-probe
#      all three shapes and take the mega-vs-XLA bench_shapes rows.
set -x
cd "$(dirname "$0")/.."
mkdir -p logs checkpoints
R5_BUDGET_S=${R5_BUDGET_S:-36000}
DEADLINE=$(( $(date +%s) + R5_BUDGET_S ))
left() { echo $(( DEADLINE - $(date +%s) )); }

# host core: transonic airfoil generation until its 1250 cases land
nohup python scripts/r4_host_gen.py > logs/host_gen_r5.log 2>&1 &
echo $! > /tmp/r5_host_gen.pid

run_until_done() { # run_until_done <jsonl> <target-epochs> <cmd...>
  local log=$1 target=$2; shift 2
  local zero=0
  while :; do
    local l; l=$(left)
    [ "$l" -le 180 ] && { echo "R5_DEADLINE $log"; return 1; }
    local cap=$(( l < 5400 ? l : 5400 ))
    local e0; e0=$(wc -l < "$log" 2>/dev/null || echo 0)
    [ "$e0" -ge "$target" ] && return 0
    timeout "$cap" "$@" >> "${log%.jsonl}.log" 2>&1
    local code=$?
    local e1; e1=$(wc -l < "$log" 2>/dev/null || echo 0)
    echo "run $log exit $code epochs $e0->$e1"
    [ "$code" -eq 0 ] && return 0
    [ "$e1" -ge "$target" ] && return 0
    if [ "$e1" -le "$e0" ]; then
      zero=$(( zero + 1 )); [ "$zero" -ge 3 ] && { echo "R5_STUCK $log"; return 1; }
    else zero=0; fi
  done
}

# A. plasticity-900 (resumes the banked r4 checkpoint)
run_until_done logs/plas900_r4.jsonl 100 python exp_plas.py \
  --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
  --n-layers 8 --batch-size 8 --slice_num 64 --max_grad_norm 0.1 \
  --epochs 100 --synth_n 900 --channel_weighted 1 --impl xla \
  --resume 1 --metrics_file logs/plas900_r4.jsonl --save_name plas900_r4

# B. elasticity near-interface retrain
TBNSS_ELAS_SAMPLING=iface run_until_done logs/elas_iface_r5.jsonl 400 \
  python exp_elas.py \
  --model Transolver_Irregular_Mesh --n-hidden 128 --n-heads 8 \
  --n-layers 8 --batch-size 8 --slice_num 64 --max_grad_norm 0.1 \
  --epochs 400 --ntrain 4000 --synth_n 4000 \
  --resume 1 --metrics_file logs/elas_iface_r5.jsonl \
  --save_name elas_iface_r5

# C. transonic airfoil training once the cache is assembled
while [ ! -f data/synthetic/airfoil_tsn_n1250.npz ] && [ "$(left)" -gt 7200 ]; do
  sleep 180
done
if [ -f data/synthetic/airfoil_tsn_n1250.npz ]; then
  TBNSS_AIRFOIL_REGIME=transonic run_until_done logs/airfoil_tsn_r5.jsonl 300 \
    python exp_airfoil.py \
    --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
    --n-layers 8 --batch-size 4 --slice_num 64 --max_grad_norm 0.1 \
    --epochs 300 --synth_n 1000 --surface_weight 8 \
    --resume 1 --metrics_file logs/airfoil_tsn_r5.jsonl \
    --save_name airfoil_tsn_r5
fi

# D. latent w64 study with whatever remains
if [ "$(left)" -gt 5400 ]; then
  LATENT_BUDGET_S=$(( $(left) - 3600 )) bash scripts/latent_r4.sh \
    >> logs/latent_r5_outer.log 2>&1
fi
echo R5_BOOTSTRAP_DONE
