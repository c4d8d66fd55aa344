#!/bin/bash
# Round-5 session-2 chip client #2: elasticity near-interface retrain
# (irregular geometry -> XLA block regardless of impl), then the transonic
# airfoil 300-epoch run -- mega impl if logs/probe_mega_params_r5.ok
# exists by then (221x51 is one of the probed padded grids), else xla.
set -x
cd "$(dirname "$0")/.."

run_loop() { # run_loop <jsonl> <last-epoch> <cmd...>
  local log=$1 target=$2; shift 2
  local zero=0
  while :; do
    local e0
    e0=$(python - "$log" <<'EOF'
import json, sys
try:
    print(max(json.loads(l)["epoch"] for l in open(sys.argv[1])))
except Exception:
    print(-1)
EOF
)
    [ "$e0" -ge "$target" ] && return 0
    timeout 5400 "$@" >> "${log%.jsonl}.log" 2>&1
    local code=$?
    local e1
    e1=$(python - "$log" <<'EOF'
import json, sys
try:
    print(max(json.loads(l)["epoch"] for l in open(sys.argv[1])))
except Exception:
    print(-1)
EOF
)
    echo "run $log exit $code epochs $e0->$e1"
    [ "$code" -eq 0 ] && return 0
    [ "$e1" -ge "$target" ] && return 0
    if [ "$e1" -le "$e0" ]; then
      zero=$((zero+1)); [ "$zero" -ge 3 ] && { echo "R5_STUCK $log"; return 1; }
    else zero=0; fi
  done
}

TBNSS_ELAS_SAMPLING=iface run_loop logs/elas_iface_r5.jsonl 399 \
  python exp_elas.py \
  --model Transolver_Irregular_Mesh --n-hidden 128 --n-heads 8 \
  --n-layers 8 --batch-size 8 --slice_num 64 --max_grad_norm 0.1 \
  --epochs 400 --ntrain 4000 --synth_n 4000 \
  --resume 1 --metrics_file logs/elas_iface_r5.jsonl \
  --save_name elas_iface_r5
echo R5_ELAS_DONE

IMPL=xla
[ -f logs/probe_mega_params_r5.ok ] && IMPL=mega
TBNSS_AIRFOIL_REGIME=transonic run_loop logs/airfoil_tsn_r5.jsonl 299 \
  python exp_airfoil.py \
  --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
  --n-layers 8 --batch-size 4 --slice_num 64 --max_grad_norm 0.1 \
  --epochs 300 --synth_n 1000 --surface_weight 8 --impl "$IMPL" \
  --resume 1 --metrics_file logs/airfoil_tsn_r5.jsonl \
  --save_name airfoil_tsn_r5
echo R5_AIRFOIL_DONE
echo R5_CLIENT2_DONE
