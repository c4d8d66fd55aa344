#!/bin/bash
# Round-4: first real 3D training run (VERDICT item 8).  32^3 synthetic
# Poisson operator, grid3d attention + use_checkpoint remat, second relay
# client next to plas900.  Per-batch dispatch (relay-safe); one window.
set -x
cd "$(dirname "$0")/.."
timeout 3000 python exp_3d.py \
  --model Transolver_Structured_Mesh_3D \
  --n-hidden 128 --n-heads 8 --n-layers 4 --batch-size 4 \
  --slice_num 32 --size 32 --synth_n 64 --epochs 30 \
  --use_checkpoint 1 --lr 0.001 --max_grad_norm 1.0 \
  --metrics_file logs/exp3d_r4.jsonl --save_name ns3d_r4 \
  >> logs/exp3d_r4.log 2>&1
echo "EXP3D_EXIT $?" >> logs/exp3d_r4.log
