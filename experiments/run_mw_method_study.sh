#!/bin/bash
# ManyWell-32 method-comparison study: 4 methods x 3 seeds at a shared
# flow-forward-pass budget (the fair-comparison normaliser, setup_run.py:33-85).
#
# Budget: 2.25e8 flow forward passes = 1/44 of the paper's 1e10 (the full budget
# is ~9 GPU-days in the reference; this reduced study preserves the method
# ORDERING comparison at equal budget). f32 with full-f32 matmuls: the round-1
# matmul-precision study (BASELINE.md) showed MW-32 tolerates f32 at parity;
# f64 on TPU is emulated and would distort the equal-budget comparison.
#
# Runs SEQUENTIALLY: one process at a time on the tunnel-shared TPU chip
# (two concurrent axon clients deadlock the tunnel - observed 2026-08-20).
# Usage: bash experiments/run_mw_method_study.sh [budget]
set -u
cd "$(dirname "$0")/.."
export MPLBACKEND=Agg
BUDGET=${1:-225000000}
mkdir -p results/mw_study

run() {  # method seed extra-overrides...
  local method=$1 seed=$2; shift 2
  local dir="results/mw_study/${method}/seed${seed}"
  if compgen -G "$dir/*/model_checkpoints/iter_*" > /dev/null; then
    echo "skip $method seed $seed (checkpoint exists)"
    return
  fi
  echo "[mw-study] $method seed $seed start $(date +%H:%M:%S)"
  # Time box via the trainer's tlimit (graceful stop WITH checkpoint + final
  # eval) rather than an external SIGTERM timeout, which would leave no
  # checkpoint and make the skip-guard silently retry the cell from scratch.
  # The outer timeout is a 2x-tlimit backstop for hangs; rc=124 is flagged.
  timeout 4800 python -u experiments/run_many_well.py \
    --config experiments/configs/many_well.yaml \
    training.seed="$seed" training.use_64_bit=false training.tlimit=0.66 \
    training.n_iterations=null training.n_flow_forward_pass="$BUDGET" \
    evaluation.save_path="$dir/" \
    evaluation.n_plots=0 evaluation.n_eval=1 evaluation.n_checkpoints=1 \
    "$@" > "/tmp/mw_study_${method}_s${seed}.log" 2>&1
  local rc=$?
  if [ "$rc" = 124 ]; then
    echo "[mw-study] FAILURE: $method seed $seed KILLED by backstop timeout — cell missing" | tee -a results/mw_study/FAILED
  fi
  echo "[mw-study] $method seed $seed done rc=$rc $(date +%H:%M:%S)"
}

for seed in 0 1 2; do
  run fab_buffer "$seed"
  run fab_no_buffer "$seed" training.use_buffer=false training.prioritised_buffer=false
  run flow_reverse_kl "$seed" fab.loss_type=flow_reverse_kl \
    training.use_buffer=false training.prioritised_buffer=false training.log_every=100
  run flow_alpha_2_div_nis "$seed" fab.loss_type=flow_alpha_2_div_nis \
    training.use_buffer=false training.prioritised_buffer=false training.log_every=100
done
echo "mw method study complete"
