#!/bin/bash
# Round-5 client-2 follow-up queue (after scripts/r5f_nan_queue.sh):
#   1. 3D hidden-64 capacity point (VERDICT r4 #4, quick).
#   2. bench_shapes retake with the fixed kernels + padded default-on.
#   3. darcy + plas refinement noise floors (VERDICT r4 #7).
#   4. Depth-scaling comparison (VERDICT r4 #8): darcy 8L vs 24L at a
#      matched 100-epoch budget (darcy steps are ~5s/epoch, the cheapest
#      grid that mirrors /root/reference/README.md:63-70's deeper-is-better
#      claim); step-time scaling sanity under nn.scan falls out of the logs.
#   5. 3D hidden-256/slice-64 run (the r4 diagnosis' untested lever),
#      resumable, fills the remaining session tail.
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

# ---- 1. 3D hidden-64 capacity point (quick) ------------------------------
run_until_done logs/exp3d_h64_r5.jsonl 29 \
  python exp_3d.py --model Transolver_Structured_Mesh_3D \
    --n-hidden 64 --n-heads 4 --n-layers 8 --batch-size 4 \
    --slice_num 32 --size 32 --synth_n 512 --epochs 30 \
    --use_checkpoint 1 --lr 0.001 --max_grad_norm 1.0 --eval_every 5 \
    --resume 1 --metrics_file logs/exp3d_h64_r5.jsonl --save_name ns3d_h64_r5 \
    >> logs/exp3d_h64_r5.log 2>&1
echo EXP3D_H64_DONE

# ---- 2. bench_shapes retake (fixed kernels, padded default-on) -----------
timeout 3600 python tools/bench_shapes.py \
  > logs/bench_shapes_r5f.json 2> logs/bench_shapes_r5f.err
echo BENCH_SHAPES_EXIT $?

# ---- 3. darcy + plas refinement floors (chip) ----------------------------
timeout 3600 python tools/refine_noise_floors.py darcy 6 \
  logs/floor_darcy_r5.log >> logs/floor_darcy_r5.log 2>&1
echo FLOOR_DARCY_EXIT $?
timeout 3600 python tools/refine_noise_floors.py plas 6 \
  logs/floor_plas_r5.log >> logs/floor_plas_r5.log 2>&1
echo FLOOR_PLAS_EXIT $?

# ---- 4. depth scaling: darcy 8L vs 24L, matched 100-epoch budget ---------
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

# ---- 5. 3D hidden-256 / slice-64 capacity run (session tail) -------------
run_until_done logs/exp3d_h256_r5.jsonl 49 \
  python exp_3d.py --model Transolver_Structured_Mesh_3D \
    --n-hidden 256 --n-heads 8 --n-layers 8 --batch-size 2 \
    --slice_num 64 --size 32 --synth_n 512 --epochs 50 \
    --use_checkpoint 1 --lr 0.001 --max_grad_norm 1.0 --eval_every 5 \
    --resume 1 --metrics_file logs/exp3d_h256_r5.jsonl --save_name ns3d_h256_r5 \
    >> logs/exp3d_h256_r5.log 2>&1
echo EXP3D_H256_DONE
echo R5F_CLIENT2B_DONE
