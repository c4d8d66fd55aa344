#!/bin/bash
# Round-5 session-3 client-2 follow-up: takes the flagship's relay slot
# when flagship_ns_r5.sh exits (training + f32 eval done), runs the 3D
# data-scaling run and the flagship visual-rollout artifacts there, so
# the client-1 queue (probes -> latent -> slice-learner chain) doesn't
# have to fit everything before the finalizer.
set -x
cd "$(dirname "$0")/.."
mkdir -p logs

while kill -0 "$(cat /tmp/flagship_r5.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "R5C2_SLOT_FREE $(date +%s)"

export TBNSS_NS_REGIME=fno

# flagship visual rollout artifacts first (cheap, high evidentiary value)
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

# 3D at 8x data (moved off the client-1 queue)
for attempt in 1 2 3; do
  ep=$(wc -l < logs/exp3d_r5.jsonl 2>/dev/null || echo 0)
  [ "$ep" -ge 60 ] && break
  timeout 4200 python exp_3d.py \
    --model Transolver_Structured_Mesh_3D \
    --n-hidden 128 --n-heads 8 --n-layers 8 --batch-size 4 \
    --slice_num 32 --size 32 --synth_n 512 --epochs 60 \
    --use_checkpoint 1 --lr 0.001 --max_grad_norm 1.0 --eval_every 5 \
    --resume 1 --metrics_file logs/exp3d_r5.jsonl --save_name ns3d_r5 \
    >> logs/exp3d_r5.log 2>&1
  echo "EXP3D_ATTEMPT_$attempt EXIT $?"
done
echo R5C_CLIENT2_DONE
