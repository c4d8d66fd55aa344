#!/bin/bash
# Client-2 addendum: the 3D capacity curve came out upside-down — h64/4H
# reached test 0.325 by ep 25 while the round-5 h128/8H run plateaued at
# 0.475 train=test (logs/exp3d_r5.jsonl).  Re-run the EXACT h128/8H config
# at a 30-epoch budget on today's tree to check whether the 0.475 plateau
# reproduces (isolating config from environment): if it reproduces, heads
# or width hurt this operator; if not, the old run was sick.  Then an
# h128/4H point separates width from head-count.
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

run_until_done logs/exp3d_h128rerun_r5.jsonl 29 \
  python exp_3d.py --model Transolver_Structured_Mesh_3D \
    --n-hidden 128 --n-heads 8 --n-layers 8 --batch-size 4 \
    --slice_num 32 --size 32 --synth_n 512 --epochs 30 \
    --use_checkpoint 1 --lr 0.001 --max_grad_norm 1.0 --eval_every 5 \
    --resume 1 --metrics_file logs/exp3d_h128rerun_r5.jsonl \
    --save_name ns3d_h128rerun_r5 >> logs/exp3d_h128rerun_r5.log 2>&1
echo EXP3D_H128RERUN_DONE

run_until_done logs/exp3d_h128h4_r5.jsonl 29 \
  python exp_3d.py --model Transolver_Structured_Mesh_3D \
    --n-hidden 128 --n-heads 4 --n-layers 8 --batch-size 4 \
    --slice_num 32 --size 32 --synth_n 512 --epochs 30 \
    --use_checkpoint 1 --lr 0.001 --max_grad_norm 1.0 --eval_every 5 \
    --resume 1 --metrics_file logs/exp3d_h128h4_r5.jsonl \
    --save_name ns3d_h128h4_r5 >> logs/exp3d_h128h4_r5.log 2>&1
echo EXP3D_H128H4_DONE
echo R5F_CLIENT2D_DONE
