#!/bin/bash
# Client-2 queue, take 3: the depth runs in take 2 silently trained on the
# 64-sample synthetic default (missing --synth_n) — rerun with a real
# 600-train split.  The darcy dataset generates HOST-side (CPU backend in
# _cache), so kick it off in the background and use the chip for the 3D
# h128 plateau-isolation rerun meanwhile.
set -x
cd "$(dirname "$0")/.."

run_until_done() {  # jsonl target_last_epoch cmd...
  local jsonl=$1 target=$2; shift 2
  for attempt in 1 2 3 4; do
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

# host-side darcy data generation (direct regime, 600/150)
nice -n 5 python - > logs/darcy_gen600.log 2>&1 <<'EOF' &
import os
os.environ.setdefault("TBNSS_PLATFORM", "cpu")
from transformerbasednavierstokesolver_tpu.utils.platform import select_platform
select_platform()
from transformerbasednavierstokesolver_tpu.data.datasets import load_darcy
out = load_darcy("/data/darcy", ntrain=1000, ntest=200, synth_n=600)
print("darcy cache ready:", [getattr(a, "shape", a) for a in out])
EOF
GEN_PID=$!

# chip: 3D h128/8H rerun (does the 0.475 plateau reproduce?)
run_until_done logs/exp3d_h128rerun_r5.jsonl 29 \
  python exp_3d.py --model Transolver_Structured_Mesh_3D \
    --n-hidden 128 --n-heads 8 --n-layers 8 --batch-size 4 \
    --slice_num 32 --size 32 --synth_n 512 --epochs 30 \
    --use_checkpoint 1 --lr 0.001 --max_grad_norm 1.0 --eval_every 5 \
    --resume 1 --metrics_file logs/exp3d_h128rerun_r5.jsonl \
    --save_name ns3d_h128rerun_r5 >> logs/exp3d_h128rerun_r5.log 2>&1
echo EXP3D_H128RERUN_DONE

wait "$GEN_PID"
echo DARCY_GEN_DONE

for L in 8 24; do
  run_until_done "logs/darcy_depth${L}b_r5.jsonl" 99 \
    python exp_darcy.py --ntrain 1000 --epochs 100 --batch-size 4 \
      --n-hidden 128 --n-heads 8 --n-layers "$L" --slice_num 64 \
      --downsample 5 --unified_pos 1 --max_grad_norm 0.1 --synth_n 600 \
      --resume 1 --metrics_file "logs/darcy_depth${L}b_r5.jsonl" \
      --save_name "darcy_depth${L}b_r5" \
      >> "logs/darcy_depth${L}b_r5.log" 2>&1
  echo "DARCY_DEPTH${L}B_DONE"
done

timeout 3600 python tools/refine_noise_floors.py darcy 4 \
  logs/floor_darcy_r5.log >> logs/floor_darcy_r5.log 2>&1
echo FLOOR_DARCY_EXIT $?
echo R5F_CLIENT2F_DONE
