#!/bin/bash
# Round-4 latent budget study (VERDICT item 5): widen the latent code from
# 16x32 to M=32/C=64, retrain the matched AE, then the merged temporal
# solver at the full 1190-sim split with a joint encoder fine-tune tail.
# Bar: closed-loop full-rollout <= 0.71 (the reference's recorded band,
# SequenSolver.ipynb cell 5); round-3's 16x32 plateau was 0.783.
set -x
cd "$(dirname "$0")/.."
mkdir -p logs sequential_checkpoints
export TBNSS_NS_REGIME=fno
DEADLINE=$(( $(date +%s) + ${LATENT_BUDGET_S:-18000} ))
left() { echo $(( DEADLINE - $(date +%s) )); }

# 1. matched autoencoder: C=64 hidden, M=32 slice tokens, 400-sim frames
if [ ! -f sequential_checkpoints/encoder_w64_ep80.ckpt ]; then
  timeout $(( $(left) < 5400 ? $(left) : 5400 )) python auto_encoder.py \
    --n-hidden 64 --n-heads 1 --n-layers 8 --slice_num 32 --unified_pos 1 \
    --batch-size 16 --epochs 80 --synth_n 400 \
    --resume 1 --metrics_file logs/auto_encoder_w64.jsonl \
    --save_name encoder_w64_ep80 \
    >> logs/auto_encoder_w64.log 2>&1
  echo "AE exit: $?"
fi

# 2. merged @ 1190 sims with the wide code + joint fine-tune tail
for attempt in 1 2 3 4 5 6; do
  [ "$(left)" -le 600 ] && { echo LATENT_DEADLINE; break; }
  ep=$(wc -l < logs/sequen_merged_w64.jsonl 2>/dev/null || echo 0)
  [ "$ep" -ge 100 ] && break
  timeout $(( $(left) < 5400 ? $(left) : 5400 )) python sequen_solver.py \
    --variant merged --epochs 100 --synth_n 1200 --sim_num 1190 \
    --latent_m 32 --latent_c 64 \
    --encoder_path sequential_checkpoints/encoder_w64_ep80.ckpt \
    --finetune_epochs 30 --eval_every 2 \
    --resume 1 --metrics_file logs/sequen_merged_w64.jsonl \
    --save_name sequen_merged_w64 \
    >> logs/sequen_merged_w64.log 2>&1
  echo "merged-w64 attempt $attempt exit $?"
done

# 3. notebook-protocol per-frame rollout eval vs the reference's curve.
# --ntrain 1190: evaluated sims 1190-1199 sit PAST the merged model's
# 1190-sim split and the flagship's 1000-sim split (the r3 runs used the
# tool's old default of sims 50-59, which were inside both training
# splits — see docs/RESULTS.md round 5 disclosure).
timeout 1800 python tools/notebook_rollout_eval.py \
  --merged sequen_merged_w64 \
  --encoder sequential_checkpoints/encoder_w64_ep80.ckpt \
  --latent_m 32 --latent_c 64 --ntrain 1190 \
  --flagship ns_flagship_r5 \
  > logs/notebook_rollout_w64.log 2>&1 || true
echo LATENT_R4_DONE
