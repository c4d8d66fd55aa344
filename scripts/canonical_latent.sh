#!/bin/bash
# Phase 2: the latent-rollout research stack, retrained on the corrected
# FNO-regime turbulence data (round 1 trained it on the broken diffusion
# data). Chain: frame autoencoder -> SequenSolverMerged -> SequenSolver
# (original, 2-phase) -> slice learners.
set -x
cd "$(dirname "$0")/.."
mkdir -p logs

export TBNSS_NS_REGIME=fno

timeout 7200 python auto_encoder.py \
  --n-hidden 32 --n-heads 1 --n-layers 8 --slice_num 16 --unified_pos 1 \
  --batch-size 16 --epochs 20 --synth_n 100 \
  --metrics_file logs/auto_encoder.jsonl --save_name encoder_fno_ep20 \
  > logs/auto_encoder.log 2>&1

timeout 7200 python sequen_solver.py --variant merged \
  --epochs 30 --synth_n 100 --sim_num 100 \
  --save_name sequen_merged_fno \
  > logs/sequen_merged.log 2>&1

timeout 7200 python sequen_solver.py --variant original \
  --epochs 10 --synth_n 100 --sim_num 100 \
  --encoder_path sequential_checkpoints/encoder_fno_ep20.ckpt \
  --save_name sequen_orig_fno \
  > logs/sequen_orig.log 2>&1

timeout 3600 python learn_slice.py --mode code --epochs 5 --synth_n 100 \
  --encoder_path sequential_checkpoints/encoder_fno_ep20.ckpt \
  --save_name slice_code_fno > logs/learn_slice.log 2>&1

echo LATENT_DONE
