#!/bin/bash
# Session-4 client-1 continuation.  The first plasticity resume attempt
# under --impl mega went straight to NaN on its first epoch
# (logs/plas900_r5.log "Epoch 21 ... nan"; the SAME banked checkpoint had
# trained cleanly under xla earlier the same day, logs/plas900_r4.jsonl
# ep 21-25) even though the padded param-grad probe passes at this exact
# shape at init -- a real-weights/mid-schedule failure the probe does not
# cover.  Plasticity therefore trains on xla; the mega-NaN finding is
# recorded in docs/RESULTS.md and the padded plans are no longer the
# impl=auto default (see ops/pallas_block.py _padded_ok).
set -x
cd "$(dirname "$0")/.."
mkdir -p logs sequential_checkpoints
export TBNSS_NS_REGIME=fno

# 1. plasticity-900 to epoch 100 (resumes the banked checkpoint), xla
zero=0
while :; do
  e0=$(python - <<'EOF'
import json
try:
    eps = {json.loads(l)["epoch"] for l in open("logs/plas900_r4.jsonl")}
    print(max(eps))
except Exception:
    print(-1)
EOF
)
  [ "$e0" -ge 99 ] && { echo R5D_PLAS_DONE; break; }
  timeout 5400 python exp_plas.py \
    --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
    --n-layers 8 --batch-size 8 --slice_num 64 --max_grad_norm 0.1 \
    --epochs 100 --synth_n 900 --channel_weighted 1 --impl xla \
    --resume 1 --metrics_file logs/plas900_r4.jsonl --save_name plas900_r4 \
    >> logs/plas900_r5.log 2>&1
  code=$?
  e1=$(python - <<'EOF'
import json
try:
    eps = {json.loads(l)["epoch"] for l in open("logs/plas900_r4.jsonl")}
    print(max(eps))
except Exception:
    print(-1)
EOF
)
  echo "plas run exit $code epochs $e0->$e1"
  [ "$code" -eq 0 ] && { echo R5D_PLAS_DONE; break; }
  if [ "$e1" -le "$e0" ]; then
    zero=$((zero+1)); [ "$zero" -ge 3 ] && { echo R5D_PLAS_STUCK; break; }
  else zero=0; fi
done

# 2. latent w64 budget study
LATENT_BUDGET_S=12600 bash scripts/latent_r4.sh
echo "LATENT_W64_EXIT $?"

# 3. reference-size (16x32) slice-learner end-to-end workflow
if [ ! -f sequential_checkpoints/encoder16_r5.ckpt ]; then
  timeout 3600 python auto_encoder.py --n-hidden 32 --n-heads 1 \
    --n-layers 8 --slice_num 16 --unified_pos 1 --batch-size 16 \
    --epochs 60 --synth_n 400 --resume 1 \
    --metrics_file logs/auto_encoder16_r5.jsonl \
    --save_name encoder16_r5 >> logs/auto_encoder16_r5.log 2>&1
  echo "AE16_EXIT $?"
fi
for attempt in 1 2 3; do
  ep=$(wc -l < logs/sequen_merged16_r5.jsonl 2>/dev/null || echo 0)
  [ "$ep" -ge 60 ] && break
  timeout 4500 python sequen_solver.py --variant merged --epochs 60 \
    --synth_n 1200 --sim_num 1190 --eval_every 2 \
    --encoder_path sequential_checkpoints/encoder16_r5.ckpt \
    --resume 1 --metrics_file logs/sequen_merged16_r5.jsonl \
    --save_name sequen_merged16_r5 >> logs/sequen_merged16_r5.log 2>&1
  echo "MERGED16_ATTEMPT_$attempt EXIT $?"
done
for mode in slice_learner vorticity; do
  timeout 3600 python learn_slice.py --mode "$mode" --epochs 4 \
    --synth_n 400 --sim_num 100 --unified_pos 1 \
    --encoder_path sequential_checkpoints/encoder16_r5.ckpt \
    --save_name "slice_${mode}_r5" \
    >> "logs/learn_slice_${mode}_r5.log" 2>&1
  echo "LEARN_SLICE_${mode}_EXIT $?"
  timeout 2400 python learn_slice.py --mode "$mode" --rollout_eval 1 \
    --synth_n 1200 --sim_num 1190 --unified_pos 1 \
    --encoder_path sequential_checkpoints/encoder16_r5.ckpt \
    --merged_path sequential_checkpoints/sequen_merged16_r5.ckpt \
    --save_name "slice_${mode}_r5" \
    >> "logs/slice_rollout_${mode}_r5.log" 2>&1
  echo "SLICE_ROLLOUT_${mode}_EXIT $?"
done

echo R5D_CLIENT1B_DONE
