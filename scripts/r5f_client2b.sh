#!/bin/bash
# Round-5 client-2 follow-up queue (after scripts/r5f_nan_queue.sh):
#   1. 3D capacity curve (VERDICT r4 #4): hidden-64 quick point, then the
#      hidden-256/slice-64 run the r4 diagnosis named as the untested lever.
#   2. Refinement noise floors for darcy + plas (VERDICT r4 #7; pipe and
#      airfoil already measured host-side).
#   3. bench_shapes retake on the padded grids with the fixed kernels.
set -x
cd "$(dirname "$0")/.."
mkdir -p logs

run_until_done() {  # jsonl target_last_epoch cmd...
  local jsonl=$1 target=$2; shift 2
  for attempt in 1 2 3 4 5 6; do
    local e
    e=$(python - "$jsonl" <<'EOF'
import json, sys
try:
    print(max(json.loads(l)["epoch"] for l in open(sys.argv[1])))
except Exception:
    print(-1)
EOF
)
    [ "$e" -ge "$target" ] && return 0
    timeout 4800 "$@"
    echo "ATTEMPT $attempt exit $? (epoch $e -> target $target)"
  done
}

# ---- 1a. 3D hidden-64 capacity point (quick) -----------------------------
run_until_done logs/exp3d_h64_r5.jsonl 29 \
  python exp_3d.py --model Transolver_Structured_Mesh_3D \
    --n-hidden 64 --n-heads 4 --n-layers 8 --batch-size 4 \
    --slice_num 32 --size 32 --synth_n 512 --epochs 30 \
    --use_checkpoint 1 --lr 0.001 --max_grad_norm 1.0 --eval_every 5 \
    --resume 1 --metrics_file logs/exp3d_h64_r5.jsonl --save_name ns3d_h64_r5 \
    >> logs/exp3d_h64_r5.log 2>&1
echo EXP3D_H64_DONE

# ---- 1b. 3D hidden-256 / slice-64 capacity run ---------------------------
run_until_done logs/exp3d_h256_r5.jsonl 49 \
  python exp_3d.py --model Transolver_Structured_Mesh_3D \
    --n-hidden 256 --n-heads 8 --n-layers 8 --batch-size 2 \
    --slice_num 64 --size 32 --synth_n 512 --epochs 50 \
    --use_checkpoint 1 --lr 0.001 --max_grad_norm 1.0 --eval_every 5 \
    --resume 1 --metrics_file logs/exp3d_h256_r5.jsonl --save_name ns3d_h256_r5 \
    >> logs/exp3d_h256_r5.log 2>&1
echo EXP3D_H256_DONE

# ---- 2. darcy + plas refinement floors (chip) ----------------------------
timeout 3600 python tools/refine_noise_floors.py darcy 6 \
  logs/floor_darcy_r5.log >> logs/floor_darcy_r5.log 2>&1
echo FLOOR_DARCY_EXIT $?
timeout 3600 python tools/refine_noise_floors.py plas 6 \
  logs/floor_plas_r5.log >> logs/floor_plas_r5.log 2>&1
echo FLOOR_PLAS_EXIT $?

# ---- 3. bench_shapes retake (fixed kernels, padded default-on) -----------
timeout 3600 env TBNSS_MEGA_PADDED=1 python tools/bench_shapes.py \
  > logs/bench_shapes_r5f.json 2> logs/bench_shapes_r5f.err
echo BENCH_SHAPES_EXIT $?
echo R5F_CLIENT2B_DONE
