#!/bin/bash
# Phase 2 of the canonical chain: Darcy 500ep (full 1000-sample synthetic
# set), the four geo benchmarks, then the latent stack.
set -x
cd "$(dirname "$0")/.."
mkdir -p logs

# 2. Darcy (scripts/Transolver_Darcy.sh config)
timeout 21600 python exp_darcy.py \
  --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
  --n-layers 8 --batch-size 4 --slice_num 64 --unified_pos 1 --ref 8 \
  --downsample 5 --max_grad_norm 0.1 --epochs 300 --ntrain 1000 --synth_n 1000 \
  --resume 1 --metrics_file logs/darcy.jsonl \
  --save_name darcy_canonical > logs/darcy.log 2>&1

# 3. The four geo benchmarks (reference script configs, fewer epochs --
#    convergence evidence, resumable to full length)
timeout 10800 python exp_elas.py \
  --model Transolver_Irregular_Mesh --n-hidden 128 --n-heads 8 \
  --n-layers 8 --batch-size 8 --slice_num 64 --max_grad_norm 0.1 \
  --epochs 200 --synth_n 1000 --resume 1 \
  --metrics_file logs/elas.jsonl --save_name elas_canonical \
  > logs/elas.log 2>&1

timeout 10800 python exp_airfoil.py \
  --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
  --n-layers 8 --batch-size 4 --slice_num 64 --max_grad_norm 0.1 \
  --epochs 150 --synth_n 1000 --resume 1 \
  --metrics_file logs/airfoil.jsonl --save_name airfoil_canonical \
  > logs/airfoil.log 2>&1

timeout 10800 python exp_pipe.py \
  --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
  --n-layers 8 --batch-size 8 --slice_num 64 --max_grad_norm 0.1 \
  --mlp_ratio 2 --epochs 150 --synth_n 1000 --resume 1 \
  --metrics_file logs/pipe.jsonl --save_name pipe_canonical \
  > logs/pipe.log 2>&1

timeout 10800 python exp_plas.py \
  --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
  --n-layers 8 --batch-size 8 --slice_num 64 --max_grad_norm 0.1 \
  --epochs 60 --synth_n 200 --resume 1 \
  --metrics_file logs/plas.jsonl --save_name plas_canonical \
  > logs/plas.log 2>&1

bash scripts/canonical_latent.sh
echo ALL_DONE
