#!/bin/bash
# Session-4 overtime tail: finish the clipped w64 joint-ft (the ft-quick
# probe proved stability through the old divergence region), re-run the
# notebook-protocol eval on the ft'd weights, then the reference-size
# 16x32 slice-learner end-to-end chain (VERDICT item 8) — the last
# unstarted queue item.  Single relay client.
set -x
cd "$(dirname "$0")/.."
mkdir -p logs sequential_checkpoints
export TBNSS_NS_REGIME=fno

# 1. full clipped ft from the banked ep-70 snapshot (epochs 26 = 6 main
#    epochs the step-reset quirk forces + 20 ft; see ROUND_NOTES)
cp sequential_checkpoints/sequen_merged_w64_ep70.ckpt \
   sequential_checkpoints/sequen_merged_w64.ckpt
for a in 1 2 3; do
  ep=$(python - <<'EOF'
import json
try:
    eps = {json.loads(l)["epoch"] for l in open("logs/sequen_merged_w64_ft2.jsonl")}
    print(max(eps))
except Exception:
    print(-1)
EOF
)
  [ "$ep" -ge 25 ] && break
  timeout 2700 python sequen_solver.py --variant merged --epochs 26 \
    --synth_n 1200 --sim_num 1190 --latent_m 32 --latent_c 64 \
    --encoder_path sequential_checkpoints/encoder_w64_ep80.ckpt \
    --finetune_epochs 20 --eval_every 2 --max_grad_norm 1.0 \
    --resume 1 --metrics_file logs/sequen_merged_w64_ft2.jsonl \
    --save_name sequen_merged_w64 >> logs/sequen_merged_w64.log 2>&1
  echo "FT2_ATTEMPT_$a EXIT $?"
done
timeout 1500 python tools/notebook_rollout_eval.py \
  --merged sequen_merged_w64 \
  --encoder sequential_checkpoints/encoder_w64_ep80.ckpt \
  --latent_m 32 --latent_c 64 --ntrain 1190 \
  --flagship ns_flagship_r5 > logs/notebook_rollout_w64_ft.log 2>&1
echo "NOTEBOOK_EVAL_FT_EXIT $?"

# 2. 16x32 slice-learner end-to-end workflow
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

# bank everything produced
for f in sequential_checkpoints/*.ckpt; do git add -f "$f" 2>/dev/null; done
git add logs/ 2>/dev/null
git commit -q -m "Session-4 overtime: clipped w64 ft + 16x32 slice-learner chain artifacts" || true
echo R5D_TAIL_DONE
