#!/bin/bash
# Elasticity benchmark, canonical hyperparameters (reference scripts/Transolver_Elas.sh)
python exp_elas.py \
  --gpu 0 \
  --model Transolver_Irregular_Mesh \
  --n-hidden 128 \
  --n-heads 8 \
  --n-layers 8 \
  --lr 0.001 \
  --max_grad_norm 0.1 \
  --batch-size 1 \
  --slice_num 64 \
  --unified_pos 0 \
  --ref 8 \
  --eval 0 \
  --save_name elas_Transolver
