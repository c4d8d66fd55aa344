#!/bin/bash
# Round-3d post-orchestrator chain: once the r3c orchestrator (flagship +
# accuracy queue + perf tail) has released the relay entirely, use the
# remaining round time for the two runs that lost their slots:
#
#   1. merged latent solver at the FULL 1190-sim split: the 400-sim run
#      overfits (train_full 0.218 vs test_full 0.848 at ep80) — sample
#      count is the binding constraint, 3x data is ~14 s/epoch.
#   2. darcy-hires 500-epoch canonical (its queue slot crashed on the mega
#      85^2 row-block bug, since fixed; resumable into round 4).
#
#   R3D_HARD_END  unix time: nothing runs past this (default 23:30 today);
#                 the gap to round end keeps the chip idle for the driver's
#                 final bench.
set -x
cd "$(dirname "$0")/.."
mkdir -p logs
HARD_END=${R3D_HARD_END:-$(date -d "23:30" +%s)}
left() { echo $(( HARD_END - $(date +%s) )); }
done_lines() { wc -l < "$1" 2>/dev/null || echo 0; }

# 0. wait for the orchestrator chain to finish (it owns up to 2 relay
#    clients until then; a third would hard-hang the relay — CLAUDE.md)
while kill -0 "$(cat /tmp/r3c_orch.pid 2>/dev/null)" 2>/dev/null; do
  sleep 120
  [ "$(left)" -le 600 ] && { echo R3D_NO_WINDOW; exit 0; }
done
echo "orchestrator done: $(date)"

# 1. merged @ 1190 sims (test = last 10 of the 1200-sim cache, unseen)
if [ -f sequential_checkpoints/encoder_fno_ep80.ckpt ] \
   && [ -f data/synthetic/ns_v1e-5_fno_s1200_t20_r64.npz ] \
   && [ "$(done_lines logs/sequen_merged_r3c.jsonl)" -lt 100 ] \
   && [ "$(left)" -gt 1500 ]; then
  TBNSS_NS_REGIME=fno timeout $(( $(left) < 3300 ? $(left) - 300 : 3000 )) \
    python sequen_solver.py \
    --variant merged --epochs 100 --synth_n 1200 --sim_num 1190 \
    --encoder_path sequential_checkpoints/encoder_fno_ep80.ckpt \
    --eval_every 2 \
    --resume 1 --metrics_file logs/sequen_merged_r3c.jsonl \
    --save_name sequen_merged_r3c \
    > logs/sequen_merged_r3c.log 2>&1
  echo "merged1190 exit $?"
fi

# 2. finish the pipe 500-epoch schedule if the queue's 5400s cap cut it
#    mid-anneal (OneCycle's final ~100 epochs produce most of the drop)
if [ -f data/synthetic/pipe_pde_n1250.npz ] \
   && [ "$(done_lines logs/pipe_r3.jsonl)" -ge 100 ] \
   && [ "$(done_lines logs/pipe_r3.jsonl)" -lt 500 ] \
   && [ "$(left)" -gt 1500 ]; then
  timeout $(( $(left) - 300 )) python exp_pipe.py \
    --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
    --n-layers 8 --batch-size 8 --slice_num 64 --unified_pos 0 \
    --max_grad_norm 0.1 --epochs 500 --ntrain 1000 --synth_n 1000 \
    --resume 1 --metrics_file logs/pipe_r3.jsonl --save_name pipe_r3 \
    >> logs/pipe_r3.log 2>&1
  echo "pipe500(finish) exit $?"
fi

# 3. darcy-hires canonical (XLA path; resumable). Skipped if the perf
#    tail's opportunistic slot already completed it.
if [ -f data/synthetic/darcy_hires_s85_n1000_200.npz ] \
   && [ "$(done_lines logs/darcy_hires_r3.jsonl)" -lt 500 ] \
   && [ "$(left)" -gt 1500 ]; then
  TBNSS_DARCY_REGIME=hires timeout $(( $(left) - 300 )) \
    python exp_darcy.py \
    --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
    --n-layers 8 --batch-size 4 --slice_num 64 --unified_pos 1 --ref 8 \
    --downsample 5 --max_grad_norm 0.1 --epochs 500 --ntrain 1000 --synth_n 1000 \
    --impl xla \
    --resume 1 --metrics_file logs/darcy_hires_r3.jsonl --save_name darcy_hires_r3 \
    >> logs/darcy_hires_r3.log 2>&1
  echo "darcy500-hires(post) exit $?"
fi

# 4. finish any other queue run its timeout cap cut (all are resumable)
finish() { # finish <jsonl> <target_epochs> <cmd...>
  local f=$1 tgt=$2; shift 2
  if [ "$(done_lines "$f")" -ge 1 ] && [ "$(done_lines "$f")" -lt "$tgt" ] \
     && [ "$(left)" -gt 1200 ]; then
    timeout $(( $(left) - 300 )) "$@" >> "${f%.jsonl}.log" 2>&1
    echo "finish ${f}: exit $?"
  fi
}
finish logs/elas_r3b.jsonl 400 python exp_elas.py \
  --model Transolver_Irregular_Mesh --n-hidden 128 --n-heads 8 \
  --n-layers 8 --batch-size 8 --slice_num 64 --max_grad_norm 0.1 \
  --epochs 400 --ntrain 4000 --synth_n 4000 \
  --resume 1 --metrics_file logs/elas_r3b.jsonl --save_name elas_r3b
finish logs/plas900_r3.jsonl 100 python exp_plas.py \
  --model Transolver_Structured_Mesh_2D --n-hidden 128 --n-heads 8 \
  --n-layers 8 --batch-size 8 --slice_num 64 --max_grad_norm 0.1 \
  --epochs 100 --synth_n 900 --channel_weighted 1 \
  --resume 1 --metrics_file logs/plas900_r3.jsonl --save_name plas900_r3

echo R3D_CHAIN_DONE
