#!/bin/bash
# Round-3 accuracy queue (VERDICT #5 + latent scale-up), designed to run
# as the SECOND relay client concurrently with the flagship resume (the
# relay tolerates two clients at ~10-20% slowdown; three hard-hang it --
# CLAUDE.md).  Each run is deadline-guarded and resumable.
#
#   ENDGAME_STOP_TS  unix time after which nothing new is started.
set -x
cd "$(dirname "$0")/.."
mkdir -p logs
STOP=${ENDGAME_STOP_TS:-$(( $(date +%s) + 14400 ))}
export TBNSS_NS_REGIME=fno

left() { echo $(( STOP - $(date +%s) )); }
done_lines() { wc -l < "$1" 2>/dev/null || echo 0; }

# 0. finish the darcy canonical 500-epoch OneCycle FIRST: cheapest run
#    with the highest bar-closure value (~15-20 min; stopped at ep300 by
#    round-2 wall clock, same schedule resumes exactly; published 500-ep
#    bar 0.0057, we were 0.00715 at ep300)
if [ "$(done_lines logs/darcy.jsonl)" -lt 500 ] && [ "$(left)" -gt 300 ]; then
  timeout $(( $(left) < 2400 ? $(left) : 2400 )) python exp_darcy.py \
    --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
    --n-layers 8 --batch-size 4 --slice_num 64 --unified_pos 1 --ref 8 \
    --downsample 5 --max_grad_norm 0.1 --epochs 500 --ntrain 1000 \
    --resume 1 --metrics_file logs/darcy.jsonl --save_name darcy_canonical \
    > logs/darcy_r3.log 2>&1
  echo "darcy500 exit $?"
fi

# 1. plasticity at the reference's 900-train scale with per-channel loss
#    (bar: <=0.004 from 0.0096; cache built host-side by
#    tools/gen_plas_chunked.py).  Falls back to the 200-sample resume when
#    the big cache is absent.
if [ -f data/synthetic/plas_fem_n1125.npz ]; then
  if [ "$(done_lines logs/plas900_r3.jsonl)" -lt 100 ] && [ "$(left)" -gt 600 ]; then
    timeout $(( $(left) < 4500 ? $(left) : 4500 )) python exp_plas.py \
      --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
      --n-layers 8 --batch-size 8 --slice_num 64 --max_grad_norm 0.1 \
      --epochs 100 --synth_n 900 --channel_weighted 1 \
      --resume 1 --metrics_file logs/plas900_r3.jsonl --save_name plas900_r3 \
      > logs/plas900_r3.log 2>&1
    echo "plas900 exit $?"
  fi
elif [ "$(done_lines logs/plas_r3c.jsonl)" -lt 100 ] && [ "$(left)" -gt 300 ]; then
  # fresh save_name: the old plas_r3 checkpoint was trained on data from
  # the pre-fix equivalent-strain formula (round-3 review) and must not
  # be resumed onto corrected-physics data
  timeout $(( $(left) < 1200 ? $(left) : 1200 )) python exp_plas.py \
    --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
    --n-layers 8 --batch-size 8 --slice_num 64 --max_grad_norm 0.1 \
    --epochs 100 --synth_n 200 --channel_weighted 1 \
    --resume 1 --metrics_file logs/plas_r3c.jsonl --save_name plas_r3c \
    > logs/plas_r3c.log 2>&1
  echo "plas exit $?"
fi

# 2. merged latent solver at 4x sims (ROUND_NOTES candidate 2: the 0.83 vs
#    0.68-0.71 gap is overfit at 100 sims; 400-sim cache already on disk).
#    The frozen encoder stays the trained ep80 artifact (recon 0.0041).
if [ ! -f logs/sequen_merged400_r3.done ] && [ "$(left)" -gt 900 ]; then
  timeout $(( $(left) < 5400 ? $(left) : 5400 )) python sequen_solver.py \
    --variant merged --epochs 100 --synth_n 400 --sim_num 400 \
    --encoder_path sequential_checkpoints/encoder_fno_ep80.ckpt \
    --save_name sequen_merged400_r3 \
    > logs/sequen_merged400_r3.log 2>&1 \
    && touch logs/sequen_merged400_r3.done
  echo "merged400 exit $?"
fi

# (moved up) pipe at the reference's 500-epoch schedule: the round-3
#    physics audit invalidated the old pipe data (wrong-PDE FEM transform),
#    so this run on the corrected cache is the ONLY valid pipe number --
#    it outranks the refinement runs below (published bar 0.0033)
if [ "$(done_lines logs/pipe500_r3.jsonl)" -lt 500 ] && [ "$(left)" -gt 1200 ]; then
  timeout $(( $(left) < 7800 ? $(left) : 7800 )) python exp_pipe.py \
    --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
    --n-layers 8 --batch-size 8 --slice_num 64 --max_grad_norm 0.1 \
    --mlp_ratio 2 --epochs 500 --synth_n 1000 \
    --resume 1 --metrics_file logs/pipe500_r3.jsonl --save_name pipe500_r3 \
    > logs/pipe500_r3.log 2>&1
  echo "pipe500 exit $?"
fi

# 3. airfoil with surface-weighted train loss (bar: <=0.02 from 0.0461)
if [ "$(done_lines logs/airfoil_r3.jsonl)" -lt 150 ] && [ "$(left)" -gt 300 ]; then
  timeout $(( $(left) < 1800 ? $(left) : 1800 )) python exp_airfoil.py \
    --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
    --n-layers 8 --batch-size 4 --slice_num 64 --max_grad_norm 0.1 \
    --epochs 150 --synth_n 1000 --surface_weight 8 \
    --resume 1 --metrics_file logs/airfoil_r3.jsonl --save_name airfoil_r3 \
    > logs/airfoil_r3.log 2>&1
  echo "airfoil exit $?"
fi

# 4. elasticity at 4x training data (train 0.009 vs test 0.0386 at 1000
#    samples is pure overfit gap; 5000-sample FEM cache on disk)
if [ -f data/synthetic/elas_fem_n5000.npz ] && [ "$(done_lines logs/elas_r3b.jsonl)" -lt 400 ] && [ "$(left)" -gt 300 ]; then
  timeout $(( $(left) < 2400 ? $(left) : 2400 )) python exp_elas.py \
    --model Transolver_Irregular_Mesh --n-hidden 128 --n-heads 8 \
    --n-layers 8 --batch-size 8 --slice_num 64 --max_grad_norm 0.1 \
    --epochs 400 --ntrain 4000 --synth_n 4000 \
    --resume 1 --metrics_file logs/elas_r3b.jsonl --save_name elas_r3b \
    > logs/elas_r3b.log 2>&1
  echo "elas4x exit $?"
fi


# 5b. darcy on the official-recipe data (421^2 node-centered solve +
#     pointwise ::5 subsample; round-3 fidelity audit) -- fresh save_name,
#     the canonical resume above stays on the data it started on.  Gated
#     on the host-side cache from tools/gen_darcy_hires.py.
if [ -f data/synthetic/darcy_hires_s85_n1000_200.npz ] \
   && [ "$(done_lines logs/darcy_hires_r3.jsonl)" -lt 500 ] && [ "$(left)" -gt 900 ]; then
  TBNSS_DARCY_REGIME=hires timeout $(( $(left) < 4500 ? $(left) : 4500 )) \
    python exp_darcy.py \
    --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
    --n-layers 8 --batch-size 4 --slice_num 64 --unified_pos 1 --ref 8 \
    --downsample 5 --max_grad_norm 0.1 --epochs 500 --ntrain 1000 --synth_n 1000 \
    --resume 1 --metrics_file logs/darcy_hires_r3.jsonl --save_name darcy_hires_r3 \
    > logs/darcy_hires_r3.log 2>&1
  echo "darcy_hires exit $?"
fi

# 5c. airfoil on the transonic (shock-capturing full-potential) data --
#     the official benchmark's regime; fresh save_name, gated on the
#     cache from tools/gen_airfoil_transonic.py.
if [ -f data/synthetic/airfoil_tsn_n1250.npz ] \
   && [ "$(done_lines logs/airfoil_tsn_r3.jsonl)" -lt 150 ] && [ "$(left)" -gt 900 ]; then
  TBNSS_AIRFOIL_REGIME=transonic timeout $(( $(left) < 2400 ? $(left) : 2400 )) \
    python exp_airfoil.py \
    --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
    --n-layers 8 --batch-size 4 --slice_num 64 --max_grad_norm 0.1 \
    --epochs 150 --synth_n 1000 \
    --resume 1 --metrics_file logs/airfoil_tsn_r3.jsonl --save_name airfoil_tsn_r3 \
    > logs/airfoil_tsn_r3.log 2>&1
  echo "airfoil_tsn exit $?"
fi

# 6. AE retrain on the FIXED split (the round-3 clamp bug evaluated the
#    0.0041 headline on a single sim; datasets.py now clamps to 80/20, so
#    this run yields a trained-on-80 / tested-on-20-unseen-sims number)
if [ ! -f logs/auto_encoder_v2.done ] && [ "$(left)" -gt 900 ]; then
  timeout $(( $(left) < 3600 ? $(left) : 3600 )) python auto_encoder.py \
    --n-hidden 32 --n-heads 1 --n-layers 8 --slice_num 16 --unified_pos 1 \
    --batch-size 16 --epochs 80 --synth_n 100 \
    --resume 1 --metrics_file logs/auto_encoder_v2.jsonl \
    --save_name encoder_fno_v2 \
    > logs/auto_encoder_v2.log 2>&1 \
    && touch logs/auto_encoder_v2.done
  echo "ae_v2 exit $?"
fi

echo ACCURACY_QUEUE_DONE
