#!/bin/bash
# Round-4 endgame: fills the relay slot the flagship frees, in VERDICT
# priority order -- transonic airfoil (item 2) first when its cache has
# landed, then the latent w64 budget study (item 5).  Session-death-proof:
# every phase resumes and is deadline-capped; the last ~75 min are left
# for the 3D run + bench probes (driven interactively or by r4_bench.sh).
set -x
cd "$(dirname "$0")/.."
mkdir -p logs
HARD_END=${R4_HARD_END:-$(( $(date +%s) + 34200 ))}
left() { echo $(( HARD_END - $(date +%s) )); }
done_lines() { wc -l < "$1" 2>/dev/null || echo 0; }

# wait for the flagship's relay slot (outer script exit)
while kill -0 "$(cat /tmp/flagship.pid 2>/dev/null)" 2>/dev/null \
      && [ "$(left)" -gt 5400 ]; do
  sleep 120
done

# 1. transonic airfoil (VERDICT item 2) -- priority when the cache landed
while [ "$(left)" -gt 7200 ] && [ ! -f data/synthetic/airfoil_tsn_n1250.npz ]; do
  sleep 180   # cache ETA is host-generation-bound; don't burn the slot
done
if [ -f data/synthetic/airfoil_tsn_n1250.npz ] \
   && [ "$(done_lines logs/airfoil_tsn_r4.jsonl)" -lt 300 ] \
   && [ "$(left)" -gt 6300 ]; then
  TBNSS_AIRFOIL_REGIME=transonic timeout $(( $(left) - 6000 )) \
    python exp_airfoil.py \
    --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
    --n-layers 8 --batch-size 4 --slice_num 64 --max_grad_norm 0.1 \
    --epochs 300 --synth_n 1000 --surface_weight 8 \
    --resume 1 --metrics_file logs/airfoil_tsn_r4.jsonl \
    --save_name airfoil_tsn_r4 >> logs/airfoil_tsn_r4.log 2>&1
  echo "airfoil-transonic exit $?"
fi

# 2. latent w64 budget study (VERDICT item 5) with whatever window remains
if [ "$(left)" -gt 5400 ]; then
  LATENT_BUDGET_S=$(( $(left) - 4800 )) bash scripts/latent_r4.sh \
    >> logs/latent_r4_outer.log 2>&1
fi
echo R4_ENDGAME_DONE
