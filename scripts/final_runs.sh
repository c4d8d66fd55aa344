#!/bin/bash
# End-of-round follow-ons: elasticity on the refined v2 cells, then the
# latent stack (short schedules; resumable).
set -x
cd "$(dirname "$0")/.."
mkdir -p logs

timeout 3600 python exp_elas.py \
  --model Transolver_Irregular_Mesh --n-hidden 128 --n-heads 8 \
  --n-layers 8 --batch-size 8 --slice_num 64 --max_grad_norm 0.1 \
  --epochs 200 --synth_n 1000 \
  --metrics_file logs/elas2.jsonl --save_name elas_canonical_v2 \
  > logs/elas2.log 2>&1

export TBNSS_NS_REGIME=fno

timeout 3600 python auto_encoder.py \
  --n-hidden 32 --n-heads 1 --n-layers 8 --slice_num 16 --unified_pos 1 \
  --batch-size 16 --epochs 15 --synth_n 100 \
  --metrics_file logs/auto_encoder.jsonl --save_name encoder_fno_ep20 \
  > logs/auto_encoder.log 2>&1

timeout 3600 python sequen_solver.py --variant merged \
  --epochs 20 --synth_n 100 --sim_num 100 \
  --save_name sequen_merged_fno \
  > logs/sequen_merged.log 2>&1

timeout 1800 python sequen_solver.py --variant original \
  --epochs 8 --synth_n 100 --sim_num 100 \
  --encoder_path sequential_checkpoints/encoder_fno_ep20.ckpt \
  --save_name sequen_orig_fno \
  > logs/sequen_orig.log 2>&1

timeout 1800 python exp_darcy.py \
  --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
  --n-layers 8 --batch-size 4 --slice_num 64 --unified_pos 1 --ref 8 \
  --downsample 5 --max_grad_norm 0.1 --epochs 500 --ntrain 1000 \
  --synth_n 1000 --resume 1 --metrics_file logs/darcy.jsonl \
  --save_name darcy_canonical > logs/darcy500.log 2>&1

echo FINAL_DONE
