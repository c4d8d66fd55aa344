#!/bin/bash
# Round-3 endgame queue: waits for the NS flagship chain to release the
# chip, then runs the remaining accuracy targets (VERDICT.md item 5) and
# the perf probes, each deadline-guarded so the chip is idle before the
# driver's end-of-round bench.
#
#   ENDGAME_STOP_TS   unix time after which nothing new is started and
#                     running children are allowed their timeout only.
set -x
cd "$(dirname "$0")/.."
mkdir -p logs
STOP=${ENDGAME_STOP_TS:-$(( $(date +%s) + 14400 ))}

# 1. wait for the flagship script (training + f32 eval) to exit
while kill -0 "$(cat /tmp/flagship_r3.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
  [ "$(date +%s)" -ge "$STOP" ] && { echo ENDGAME_TIMEOUT_WAITING; exit 1; }
done
echo "flagship chain done: $(date)"

left() { echo $(( STOP - $(date +%s) )); }

done_lines() { wc -l < "$1" 2>/dev/null || echo 0; }

# 2. plasticity with per-channel loss (bar: <=0.004 from 0.0096)
if [ "$(done_lines logs/plas_r3.jsonl)" -lt 100 ] && [ "$(left)" -gt 300 ]; then
  timeout $(( $(left) < 1200 ? $(left) : 1200 )) python exp_plas.py \
    --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
    --n-layers 8 --batch-size 8 --slice_num 64 --max_grad_norm 0.1 \
    --epochs 100 --synth_n 200 --channel_weighted 1 \
    --resume 1 --metrics_file logs/plas_r3.jsonl --save_name plas_r3 \
    > logs/plas_r3.log 2>&1
  echo "plas exit $?"
fi

# 3. airfoil with surface-weighted train loss (bar: <=0.02 from 0.0461)
if [ "$(done_lines logs/airfoil_r3.jsonl)" -lt 150 ] && [ "$(left)" -gt 300 ]; then
  timeout $(( $(left) < 1800 ? $(left) : 1800 )) python exp_airfoil.py \
    --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
    --n-layers 8 --batch-size 4 --slice_num 64 --max_grad_norm 0.1 \
    --epochs 150 --synth_n 1000 --surface_weight 8 \
    --resume 1 --metrics_file logs/airfoil_r3.jsonl --save_name airfoil_r3 \
    > logs/airfoil_r3.log 2>&1
  echo "airfoil exit $?"
fi

# 3b. elasticity at 4x training data (CPU-generated during the round;
#     train 0.009 vs test 0.0386 at 1000 sims is pure overfit gap)
if [ -f data/synthetic/elas_fem_n5000.npz ] && [ "$(done_lines logs/elas_r3b.jsonl)" -lt 400 ] && [ "$(left)" -gt 300 ]; then
  timeout $(( $(left) < 1500 ? $(left) : 1500 )) python exp_elas.py \
    --model Transolver_Irregular_Mesh --n-hidden 128 --n-heads 8 \
    --n-layers 8 --batch-size 8 --slice_num 64 --max_grad_norm 0.1 \
    --epochs 400 --ntrain 4000 --synth_n 4000 \
    --resume 1 --metrics_file logs/elas_r3b.jsonl --save_name elas_r3b \
    > logs/elas_r3b.log 2>&1
  echo "elas4x exit $?"
fi

# 4. forward/backward ratio probe: anchors the MFU estimate's bwd~2x-fwd
#    assumption (bench.py _per_step_flops) with measured step times
if [ "$(left)" -gt 240 ]; then
  timeout 600 python tools/fwd_bwd_ratio.py > logs/fwd_bwd_ratio.json 2> logs/fwd_bwd_ratio.log
  echo "ratio probe exit $?"
fi

# 5. scan-unroll perf probe (VERDICT item 8: attack BPTT scan overhead)
if [ "$(left)" -gt 600 ]; then
  for u in 2 5; do
    BENCH_UNROLL=$u timeout 600 python bench.py \
      > "logs/bench_r3_unroll$u.json" 2>> logs/bench_r3_local.log
    echo "unroll$u: $(cat logs/bench_r3_unroll$u.json)"
  done
fi

# 6. record the round-3 bench number with the chip otherwise idle
if [ "$(left)" -gt 180 ]; then
  timeout 900 python bench.py > logs/bench_r3_local.json 2>> logs/bench_r3_local.log
  echo "bench exit $?"
  cat logs/bench_r3_local.json
fi

echo ENDGAME_DONE
