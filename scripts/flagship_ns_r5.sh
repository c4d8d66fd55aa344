#!/bin/bash
# Round-5 NS flagship: identical recipe to flagship_ns_r3b.sh (400-epoch
# OneCycle, official 1000/200 pointwise split, bf16 mega) PLUS
# --aug_roll 1 — anti-diagonal torus-roll augmentation, an exact symmetry
# of the forced FNO dynamics (the forcing 0.1(sin+cos)(2pi(x+y)) is
# invariant under x->x+s, y->y-s).  r3b finished train_step 0.024 vs
# test_step 0.084 (closed-loop 0.110): squarely overfit, so 64x effective
# data is the highest-leverage change toward the published 0.090
# (/root/reference/README.md:29).  One change at a time for attribution.
set -x
cd "$(dirname "$0")/.."
mkdir -p logs
export TBNSS_NS_REGIME=fno
export TBNSS_NS_DOWNSAMPLE=pointwise
DEADLINE=$(( $(date +%s) + ${FLAGSHIP_BUDGET_S:-27000} ))

IMPL=${FLAGSHIP_IMPL:-mega}
zero_prog=0
for attempt in $(seq 1 40); do
  left=$(( DEADLINE - $(date +%s) ))
  if [ "$left" -le 120 ]; then echo "FLAGSHIP_DEADLINE"; break; fi
  cap=$(( left < 4500 ? left : 4500 ))
  ep0=$(wc -l < logs/ns_flagship_r5.jsonl 2>/dev/null || echo 0)
  timeout "$cap" python exp_ns.py \
    --model Transolver_Structured_Mesh_2D \
    --n-hidden 256 --n-heads 8 --n-layers 8 --lr 0.001 \
    --batch-size 2 --slice_num 32 --unified_pos 1 --ref 8 \
    --epochs 400 --ntrain 1000 --synth_n 1200 \
    --impl "$IMPL" --dtype bf16 --max_grad_norm 1.0 \
    --eval_every 5 --aug_roll 1 \
    --resume 1 --metrics_file logs/ns_flagship_r5.jsonl \
    --save_name ns_flagship_r5 \
    >> logs/ns_flagship_r5.log 2>&1
  code=$?
  ep1=$(wc -l < logs/ns_flagship_r5.jsonl 2>/dev/null || echo 0)
  echo "attempt $attempt impl=$IMPL exit $code epochs $ep0->$ep1"
  if [ $code -eq 0 ]; then
    echo FLAGSHIP_DONE
    break
  fi
  if [ "$ep1" -gt "$ep0" ]; then
    zero_prog=0
  else
    zero_prog=$(( zero_prog + 1 ))
    if [ "$zero_prog" -ge 2 ] && [ "$IMPL" = mega ]; then
      echo "FLAGSHIP_IMPL_FALLBACK: mega made no progress twice; xla"
      IMPL=xla
      zero_prog=0
    fi
  fi
done

# closed-loop eval of the final checkpoint in XLA f32 (same pointwise data)
timeout 2400 python exp_ns.py \
  --model Transolver_Structured_Mesh_2D \
  --n-hidden 256 --n-heads 8 --n-layers 8 \
  --batch-size 2 --slice_num 32 --unified_pos 1 --ref 8 \
  --ntrain 1000 --synth_n 1200 --impl xla \
  --eval 1 --save_name ns_flagship_r5 \
  > logs/ns_flagship_r5_eval_f32.log 2>&1
echo "f32 eval exit: $?"
echo FLAGSHIP_SCRIPT_END
