#!/bin/bash
# Round-5 session-2 chip client #1:
#   1. TPU param-grad probe of the padded megakernel at all four padded
#      benchmark grids (VERDICT r4 item 1 "Done" criterion), both sides
#      at matmul precision 'highest' (see tools/probe_mega_param_grads.py).
#   2. Resume plasticity-900 to the 100-epoch schedule; --impl mega if
#      the probe passed (faster, and now correctness-validated), else xla.
set -x
cd "$(dirname "$0")/.."

timeout 3600 python tools/probe_mega_param_grads.py \
  > logs/probe_mega_params_r5.log 2>&1
if [ $? -eq 0 ]; then
  IMPL=mega; echo PASS > logs/probe_mega_params_r5.ok
else
  IMPL=xla; rm -f logs/probe_mega_params_r5.ok
fi
echo "PROBE_DONE impl=$IMPL"

zero=0
while :; do
  e0=$(python - <<'EOF'
import json
try:
    eps = {json.loads(l)["epoch"] for l in open("logs/plas900_r4.jsonl")}
    print(max(eps))
except Exception:
    print(-1)
EOF
)
  [ "$e0" -ge 99 ] && { echo R5_PLAS_DONE; break; }
  timeout 5400 python exp_plas.py \
    --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
    --n-layers 8 --batch-size 8 --slice_num 64 --max_grad_norm 0.1 \
    --epochs 100 --synth_n 900 --channel_weighted 1 --impl "$IMPL" \
    --resume 1 --metrics_file logs/plas900_r4.jsonl --save_name plas900_r4 \
    >> logs/plas900_r5.log 2>&1
  code=$?
  e1=$(python - <<'EOF'
import json
try:
    eps = {json.loads(l)["epoch"] for l in open("logs/plas900_r4.jsonl")}
    print(max(eps))
except Exception:
    print(-1)
EOF
)
  echo "plas run exit $code epochs $e0->$e1"
  [ "$code" -eq 0 ] && { echo R5_PLAS_DONE; break; }
  if [ "$e1" -le "$e0" ]; then
    zero=$((zero+1)); [ "$zero" -ge 3 ] && { echo R5_PLAS_STUCK; break; }
  else zero=0; fi
done
