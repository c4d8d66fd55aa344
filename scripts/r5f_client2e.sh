#!/bin/bash
# Client-2 queue, take 2 (after the _seg_dot hi/lo-split perf fix):
#   0. dissect-check the dumped NaN case under the split kernels (must be
#      finite and ~0.2052)
#   1. bench_shapes retake with the split kernels
#   2. darcy + plas refinement floors
#   3. darcy depth comparison 8L vs 24L at matched 100-epoch budget
#   4. 3D h256/slice64 capacity run (resumable, session tail)
#   5. 3D h128 rerun + h128/4H point (plateau isolation)
set -x
cd "$(dirname "$0")/.."

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

timeout 1800 python tools/probe_mega_nan_dissect.py \
  > logs/r5f_nan_dissect_split.log 2>&1
echo DISSECT_SPLIT_EXIT $?

timeout 3600 python tools/bench_shapes.py \
  > logs/bench_shapes_r5g.json 2> logs/bench_shapes_r5g.err
echo BENCH_SHAPES_EXIT $?

timeout 3600 python tools/refine_noise_floors.py darcy 6 \
  logs/floor_darcy_r5.log >> logs/floor_darcy_r5.log 2>&1
echo FLOOR_DARCY_EXIT $?
timeout 3600 python tools/refine_noise_floors.py plas 6 \
  logs/floor_plas_r5.log >> logs/floor_plas_r5.log 2>&1
echo FLOOR_PLAS_EXIT $?

for L in 8 24; do
  run_until_done "logs/darcy_depth${L}_r5.jsonl" 99 \
    python exp_darcy.py --ntrain 1000 --epochs 100 --batch-size 4 \
      --n-hidden 128 --n-heads 8 --n-layers "$L" --slice_num 64 \
      --downsample 5 --unified_pos 1 --max_grad_norm 0.1 \
      --resume 1 --metrics_file "logs/darcy_depth${L}_r5.jsonl" \
      --save_name "darcy_depth${L}_r5" \
      >> "logs/darcy_depth${L}_r5.log" 2>&1
  echo "DARCY_DEPTH${L}_DONE"
done

run_until_done logs/exp3d_h256_r5.jsonl 49 \
  python exp_3d.py --model Transolver_Structured_Mesh_3D \
    --n-hidden 256 --n-heads 8 --n-layers 8 --batch-size 2 \
    --slice_num 64 --size 32 --synth_n 512 --epochs 50 \
    --use_checkpoint 1 --lr 0.001 --max_grad_norm 1.0 --eval_every 5 \
    --resume 1 --metrics_file logs/exp3d_h256_r5.jsonl --save_name ns3d_h256_r5 \
    >> logs/exp3d_h256_r5.log 2>&1
echo EXP3D_H256_DONE

exec bash scripts/r5f_client2d.sh
