#!/bin/bash
# Round-3 latent chain: AE to the reference's ep50 regime, then the
# temporal solvers with the TRAINED frozen encoder (round 2 accidentally
# trained merged against a randomly-initialized encoder: the default
# --encoder_path did not exist).
set -x
cd "$(dirname "$0")/.."
mkdir -p logs
export TBNSS_NS_REGIME=fno

timeout 3600 python auto_encoder.py \
  --n-hidden 32 --n-heads 1 --n-layers 8 --slice_num 16 --unified_pos 1 \
  --batch-size 16 --epochs 80 --synth_n 100 \
  --metrics_file logs/auto_encoder_r3.jsonl --save_name encoder_fno_ep80 \
  > logs/auto_encoder_r3.log 2>&1
echo "AE exit: $?"

timeout 7200 python sequen_solver.py --variant merged \
  --epochs 60 --synth_n 100 --sim_num 100 \
  --encoder_path sequential_checkpoints/encoder_fno_ep80.ckpt \
  --save_name sequen_merged_r3 \
  > logs/sequen_merged_r3.log 2>&1
echo "merged exit: $?"

timeout 3600 python sequen_solver.py --variant original \
  --epochs 10 --synth_n 100 --sim_num 100 \
  --encoder_path sequential_checkpoints/encoder_fno_ep80.ckpt \
  --save_name sequen_orig_r3 \
  > logs/sequen_orig_r3.log 2>&1
echo "orig exit: $?"

timeout 3600 python learn_slice.py --mode code --epochs 5 --synth_n 100 \
  --encoder_path sequential_checkpoints/encoder_fno_ep80.ckpt \
  --save_name slice_code_r3 > logs/learn_slice_r3.log 2>&1
echo "slice exit: $?"
echo LATENT_DONE
