#!/bin/bash
# Round-5 session-3 client-1 follow-up queue.  Takes over the relay slot
# when the r5b plasticity loop finishes (<=2 clients at all times; the NS
# flagship holds the other slot).  Order: short kernel-evidence probes
# first, then the latent w64 quality push, then the 16x32 slice-learner
# end-to-end workflow, then the 3D data-scaling run, then flagship visual
# artifacts.  Every long run is resumable; every step is timeout-bounded.
set -x
cd "$(dirname "$0")/.."
mkdir -p logs sequential_checkpoints

# 0. wait for the plas loop to release the slot
while kill -0 "$(cat /tmp/r5b_c1.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "R5C_SLOT_FREE $(date +%s)"

export TBNSS_NS_REGIME=fno

# 1. retry the 221x51 padded param-grad probe (the 4-shape run's last
#    dispatch died to a relay compile-helper OOM, not a numerical failure)
timeout 1800 python tools/probe_mega_param_grads.py 221 51 128 8 64 \
  > logs/probe_mega_221_r5.log 2>&1
echo "PROBE221_EXIT $?"

# 2. mega-vs-xla train-step rows on every benchmark grid (VERDICT item 1
#    "Done" criterion now that the padded plans are enabled)
timeout 5400 python tools/bench_shapes.py \
  > logs/bench_shapes_r5.json 2> logs/bench_shapes_r5.log
echo "BENCH_SHAPES_EXIT $?"

# 3. latent w64 budget study (AE w64 + merged w64 + notebook-protocol eval)
LATENT_BUDGET_S=9000 bash scripts/latent_r4.sh
echo "LATENT_W64_EXIT $?"

# 4. reference-size (16x32) chain for the slice-learner inference workflow
#    (/root/reference/SliceLearner.py + SequenSolver.py:182-291): AE ->
#    merged -> two slice heads -> closed-loop rollout decoding merged codes
#    with the heads' weights vs the merged forward_slice path.
if [ ! -f sequential_checkpoints/encoder16_r5.ckpt ]; then
  timeout 3600 python auto_encoder.py --n-hidden 32 --n-heads 1 \
    --n-layers 8 --slice_num 16 --unified_pos 1 --batch-size 16 \
    --epochs 60 --synth_n 400 --resume 1 \
    --metrics_file logs/auto_encoder16_r5.jsonl \
    --save_name encoder16_r5 >> logs/auto_encoder16_r5.log 2>&1
  echo "AE16_EXIT $?"
fi
for attempt in 1 2 3; do
  ep=$(wc -l < logs/sequen_merged16_r5.jsonl 2>/dev/null || echo 0)
  [ "$ep" -ge 60 ] && break
  timeout 4500 python sequen_solver.py --variant merged --epochs 60 \
    --synth_n 1200 --sim_num 1190 --eval_every 2 \
    --encoder_path sequential_checkpoints/encoder16_r5.ckpt \
    --resume 1 --metrics_file logs/sequen_merged16_r5.jsonl \
    --save_name sequen_merged16_r5 >> logs/sequen_merged16_r5.log 2>&1
  echo "MERGED16_ATTEMPT_$attempt EXIT $?"
done
for mode in slice_learner vorticity; do
  timeout 3600 python learn_slice.py --mode "$mode" --epochs 4 \
    --synth_n 400 --sim_num 100 --unified_pos 1 \
    --encoder_path sequential_checkpoints/encoder16_r5.ckpt \
    --save_name "slice_${mode}_r5" \
    >> "logs/learn_slice_${mode}_r5.log" 2>&1
  echo "LEARN_SLICE_${mode}_EXIT $?"
  # rollout on sims 1190-1199: held out from BOTH the merged model's
  # 1190-sim training split and the slice heads' 100-sim training split
  timeout 2400 python learn_slice.py --mode "$mode" --rollout_eval 1 \
    --synth_n 1200 --sim_num 1190 --unified_pos 1 \
    --encoder_path sequential_checkpoints/encoder16_r5.ckpt \
    --merged_path sequential_checkpoints/sequen_merged16_r5.ckpt \
    --save_name "slice_${mode}_r5" \
    >> "logs/slice_rollout_${mode}_r5.log" 2>&1
  echo "SLICE_ROLLOUT_${mode}_EXIT $?"
done

# (the 3D run and the flagship rollout artifacts moved to
#  scripts/r5c_client2.sh, which takes the flagship's slot when it frees)

echo R5C_CLIENT1_DONE
