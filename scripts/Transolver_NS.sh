#!/bin/bash
# Navier-Stokes benchmark, canonical hyperparameters (reference scripts/Transolver_NS.sh)
python exp_ns.py \
  --gpu 0 \
  --model Transolver_Structured_Mesh_2D \
  --n-hidden 256 \
  --n-heads 8 \
  --n-layers 8 \
  --lr 0.001 \
  --batch-size 2 \
  --slice_num 32 \
  --unified_pos 1 \
  --ref 8 \
  --eval 0 \
  --save_name ns_Transolver
