#!/bin/bash
# Round-4 NS flagship (VERDICT item 1): the benchmark's 1000/200 split on
# the 1200-sim FNO-regime dataset in the OFFICIAL pointwise downsample
# regime (sol[::4,::4], the official generation script's product —
# /root/reference/exp_ns.py:38; published bar = rollout rel-L2 0.090).
# Waits for the dual generator's assembled npz, then runs the 400-epoch
# OneCycle schedule with resume-on-death, mega->xla fallback, and a final
# f32 closed-loop eval.  Second relay client next to the r4 queue.
set -x
cd "$(dirname "$0")/.."
mkdir -p logs checkpoints
export TBNSS_NS_REGIME=fno
export TBNSS_NS_DOWNSAMPLE=pointwise
DEADLINE=$(( $(date +%s) + ${FLAGSHIP_BUDGET_S:-32400} ))

until [ -f data/synthetic/ns_v1e-5_fnopw_s1200_t20_r64.npz ]; do
  [ $(( DEADLINE - $(date +%s) )) -le 600 ] && { echo FLAGSHIP_NO_DATA; exit 1; }
  sleep 120
done

IMPL=${FLAGSHIP_IMPL:-mega}
zero_prog=0
for attempt in $(seq 1 40); do
  left=$(( DEADLINE - $(date +%s) ))
  if [ "$left" -le 120 ]; then echo "FLAGSHIP_DEADLINE"; break; fi
  cap=$(( left < 4500 ? left : 4500 ))
  ep0=$(wc -l < logs/ns_flagship_r4.jsonl 2>/dev/null || echo 0)
  timeout "$cap" python exp_ns.py \
    --model Transolver_Structured_Mesh_2D \
    --n-hidden 256 --n-heads 8 --n-layers 8 --lr 0.001 \
    --batch-size 2 --slice_num 32 --unified_pos 1 --ref 8 \
    --epochs 400 --ntrain 1000 --synth_n 1200 \
    --impl "$IMPL" --dtype bf16 --max_grad_norm 1.0 \
    --eval_every 5 \
    --resume 1 --metrics_file logs/ns_flagship_r4.jsonl \
    --save_name ns_flagship_r4 \
    >> logs/ns_flagship_r4.log 2>&1
  code=$?
  ep1=$(wc -l < logs/ns_flagship_r4.jsonl 2>/dev/null || echo 0)
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
  --eval 1 --save_name ns_flagship_r4 \
  > logs/ns_flagship_r4_eval_f32.log 2>&1
echo "f32 eval exit: $?"
echo FLAGSHIP_SCRIPT_END
