#!/bin/bash
# Round-3c accuracy queue (post-reboot): runs as the SECOND relay client
# concurrently with the r3b flagship (two clients are fine; three hard-hang
# the relay — CLAUDE.md).  Every cache was wiped by the reboot, so each run
# gates on its regenerated cache (scripts/r3c_host_gen.py builds them
# host-side in priority order) and uses a FRESH save_name: no run may
# resume a checkpoint trained on pre-reboot (or pre-physics-fix) data.
#
#   ENDGAME_STOP_TS  unix time after which nothing new is started.
set -x
cd "$(dirname "$0")/.."
mkdir -p logs
STOP=${ENDGAME_STOP_TS:-$(( $(date +%s) + 28800 ))}
export TBNSS_NS_REGIME=fno

left() { echo $(( STOP - $(date +%s) )); }
done_lines() { wc -l < "$1" 2>/dev/null || echo 0; }
wait_for() { # wait_for <file> <max_s>: poll for a cache the host chain builds
  local t=0
  while [ ! -f "$1" ] && [ "$t" -lt "$2" ] && [ "$(left)" -gt 600 ]; do
    sleep 60; t=$(( t + 60 ))
  done
  [ -f "$1" ]
}

# 1. darcy 500-epoch canonical on the official-recipe hires data
#    (round-2 number 0.00715@300ep was on the 'direct' regime; published
#    bar 0.0057@500ep on the real piececonst files)
if wait_for data/synthetic/darcy_hires_s85_n1000_200.npz 7200 \
   && [ "$(done_lines logs/darcy_hires_r3.jsonl)" -lt 500 ] && [ "$(left)" -gt 900 ]; then
  TBNSS_DARCY_REGIME=hires timeout $(( $(left) < 4200 ? $(left) : 4200 )) \
    python exp_darcy.py \
    --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
    --n-layers 8 --batch-size 4 --slice_num 64 --unified_pos 1 --ref 8 \
    --downsample 5 --max_grad_norm 0.1 --epochs 500 --ntrain 1000 --synth_n 1000 \
    --resume 1 --metrics_file logs/darcy_hires_r3.jsonl --save_name darcy_hires_r3 \
    > logs/darcy_hires_r3.log 2>&1
  echo "darcy500-hires exit $?"
fi

# 2. latent chain: retrain the AE (checkpoint wiped), then merged at 400
#    sims on the 1200-sim cache — test = last 10 sims, unseen by
#    construction (loader takes u[-ntest:]).  Round-3 merged@100sims was
#    0.801 with train 0.280: a pure sample-starvation gap.
if [ -f data/synthetic/ns_v1e-5_fno_s100_t20_r64.npz ] && [ "$(left)" -gt 900 ]; then
  if [ ! -f sequential_checkpoints/encoder_fno_ep80.ckpt ]; then
    timeout 3600 python auto_encoder.py \
      --n-hidden 32 --n-heads 1 --n-layers 8 --slice_num 16 --unified_pos 1 \
      --batch-size 16 --epochs 80 --synth_n 100 \
      --metrics_file logs/auto_encoder_r3b.jsonl --save_name encoder_fno_ep80 \
      > logs/auto_encoder_r3b.log 2>&1
    echo "AE exit: $?"
  fi
fi
if [ -f sequential_checkpoints/encoder_fno_ep80.ckpt ] \
   && [ -f data/synthetic/ns_v1e-5_fno_s1200_t20_r64.npz ] \
   && [ "$(done_lines logs/sequen_merged_r3b.jsonl)" -lt 80 ] && [ "$(left)" -gt 2400 ]; then
  timeout $(( $(left) < 7200 ? $(left) : 7200 )) python sequen_solver.py \
    --variant merged --epochs 80 --synth_n 1200 --sim_num 400 \
    --encoder_path sequential_checkpoints/encoder_fno_ep80.ckpt \
    --resume 1 --metrics_file logs/sequen_merged_r3b.jsonl \
    --save_name sequen_merged_r3b \
    > logs/sequen_merged_r3b.log 2>&1
  echo "merged400 exit: $?"
fi

# 3. pipe 500-epoch on the corrected-physics FEM data (the round-2 0.00444
#    trained on the pre-fix distorted-operator data — J^-1 transpose bug)
if wait_for data/synthetic/pipe_pde_n1250.npz 3600 \
   && [ "$(done_lines logs/pipe_r3.jsonl)" -lt 500 ] && [ "$(left)" -gt 1200 ]; then
  timeout $(( $(left) < 5400 ? $(left) : 5400 )) python exp_pipe.py \
    --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
    --n-layers 8 --batch-size 8 --slice_num 64 --unified_pos 0 \
    --max_grad_norm 0.1 --epochs 500 --ntrain 1000 --synth_n 1000 \
    --resume 1 --metrics_file logs/pipe_r3.jsonl --save_name pipe_r3 \
    > logs/pipe_r3.log 2>&1
  echo "pipe500 exit $?"
fi

# 4. elasticity at 4x training data (train 0.009 vs test 0.0386 at 1000
#    sims is pure overfit gap)
if [ -f data/synthetic/elas_fem_n5000.npz ] \
   && [ "$(done_lines logs/elas_r3b.jsonl)" -lt 400 ] && [ "$(left)" -gt 1200 ]; then
  timeout $(( $(left) < 5400 ? $(left) : 5400 )) python exp_elas.py \
    --model Transolver_Irregular_Mesh --n-hidden 128 --n-heads 8 \
    --n-layers 8 --batch-size 8 --slice_num 64 --max_grad_norm 0.1 \
    --epochs 400 --ntrain 4000 --synth_n 4000 \
    --resume 1 --metrics_file logs/elas_r3b.jsonl --save_name elas_r3b \
    > logs/elas_r3b.log 2>&1
  echo "elas4x exit $?"
fi

# 5. plasticity at the reference's 900-train scale, corrected physics,
#    per-channel loss (bar: <=0.004 from 0.0096)
if wait_for data/synthetic/plas_fem_n1125.npz 3600 \
   && [ "$(done_lines logs/plas900_r3.jsonl)" -lt 100 ] && [ "$(left)" -gt 1200 ]; then
  timeout $(( $(left) < 5400 ? $(left) : 5400 )) python exp_plas.py \
    --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
    --n-layers 8 --batch-size 8 --slice_num 64 --max_grad_norm 0.1 \
    --epochs 100 --synth_n 900 --channel_weighted 1 \
    --resume 1 --metrics_file logs/plas900_r3.jsonl --save_name plas900_r3 \
    > logs/plas900_r3.log 2>&1
  echo "plas900 exit $?"
fi

# 6. airfoil: transonic (official regime) if its cache landed in time,
#    else the subsonic KT cache with the surface-weighted loss
if [ -f data/synthetic/airfoil_tsn_n1250.npz ] && [ "$(left)" -gt 1200 ]; then
  TBNSS_AIRFOIL_REGIME=transonic timeout $(( $(left) < 3600 ? $(left) : 3600 )) \
    python exp_airfoil.py \
    --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
    --n-layers 8 --batch-size 4 --slice_num 64 --max_grad_norm 0.1 \
    --epochs 150 --synth_n 1000 --surface_weight 8 \
    --resume 1 --metrics_file logs/airfoil_tsn_r3.jsonl --save_name airfoil_tsn_r3 \
    > logs/airfoil_tsn_r3.log 2>&1
  echo "airfoil-transonic exit $?"
elif [ -f data/synthetic/airfoil_pde_n1250.npz ] \
     && [ "$(done_lines logs/airfoil_r3.jsonl)" -lt 150 ] && [ "$(left)" -gt 1200 ]; then
  timeout $(( $(left) < 3600 ? $(left) : 3600 )) python exp_airfoil.py \
    --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
    --n-layers 8 --batch-size 4 --slice_num 64 --max_grad_norm 0.1 \
    --epochs 150 --synth_n 1000 --surface_weight 8 \
    --resume 1 --metrics_file logs/airfoil_r3.jsonl --save_name airfoil_r3 \
    > logs/airfoil_r3.log 2>&1
  echo "airfoil-kt exit $?"
fi

echo R3C_QUEUE_DONE
