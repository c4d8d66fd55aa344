#!/bin/bash
# Client-2: epoch-level acceptance of the padded-mega fix, then the
# r5f_client2b queue.  Resumes the REAL exp_plas trainer from the pinned
# epoch-21 state (the exact run that NaN'd pre-fix, logs/plas900_r5.log)
# under an explicit --impl mega for ~2 epochs; compare train_step_loss vs
# the XLA run's recorded ep-22/23 history (0.056 / 0.068,
# logs/plas900_r4.jsonl).
set -x
cd "$(dirname "$0")/.."
timeout 3000 python exp_plas.py \
  --model Transolver_Structured_Mesh_2D \
  --n-hidden 128 --n-heads 8 --n-layers 8 --batch-size 8 \
  --slice_num 64 --max_grad_norm 0.1 --epochs 100 \
  --synth_n 900 --channel_weighted 1 --impl mega --eval_every 1 \
  --resume 1 --metrics_file logs/plas900_mega_r5f.jsonl \
  --save_name plas900_mega_r5f \
  >> logs/plas900_mega_r5f.log 2>&1
echo PLAS_MEGA_ACCEPT_EXIT $?
exec bash scripts/r5f_client2b.sh
