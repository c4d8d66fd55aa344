#!/bin/bash
# Round-5 session-4 chip client #2 (slot A): the NS flagship + aug_roll
# run lost to the 4th wipe (restarts from epoch 0 -- no checkpoint
# survived), then the flagship visual-rollout artifacts (VERDICT item 7),
# then the 3D data-scaling run (item 6).
set -x
cd "$(dirname "$0")/.."
mkdir -p logs results
export TBNSS_NS_REGIME=fno

FLAGSHIP_BUDGET_S=${FLAGSHIP_BUDGET_S:-24000} bash scripts/flagship_ns_r5.sh \
  > logs/flagship_r5_driver.log 2>&1
echo "FLAGSHIP_EXIT $?"

# flagship visual rollout artifacts (cheap, high evidentiary value)
TBNSS_NS_DOWNSAMPLE=pointwise timeout 2400 python visualize_rollout.py \
  --save_name ns_flagship_r5 --synth_n 1200 --ntrain 1000 --ntest 200 \
  --frames 10 --case 0 > logs/visualize_rollout_r5.log 2>&1
echo "GIF_EXIT $?"
TBNSS_NS_DOWNSAMPLE=pointwise timeout 1200 python visualize_rollout.py \
  --save_name ns_flagship_r5 --synth_n 1200 --ntrain 1000 --ntest 200 \
  --frames 10 --case 7 \
  --out_dir results/ns_flagship_r5/rollout_case7 \
  >> logs/visualize_rollout_r5.log 2>&1
echo "GIF2_EXIT $?"

# 3D at 8x data (VERDICT item 6: a defensible 3D number)
for attempt in 1 2 3; do
  ep=$(python - <<'EOF'
import json
try:
    eps = {json.loads(l)["epoch"] for l in open("logs/exp3d_r5.jsonl")}
    print(max(eps))
except Exception:
    print(-1)
EOF
)
  [ "$ep" -ge 59 ] && break
  timeout 4800 python exp_3d.py \
    --model Transolver_Structured_Mesh_3D \
    --n-hidden 128 --n-heads 8 --n-layers 8 --batch-size 4 \
    --slice_num 32 --size 32 --synth_n 512 --epochs 60 \
    --use_checkpoint 1 --lr 0.001 --max_grad_norm 1.0 --eval_every 5 \
    --resume 1 --metrics_file logs/exp3d_r5.jsonl --save_name ns3d_r5 \
    >> logs/exp3d_r5.log 2>&1
  echo "EXP3D_ATTEMPT_$attempt EXIT $?"
done
echo R5D_CLIENT2_DONE
