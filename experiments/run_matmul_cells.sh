#!/bin/bash
# Matmul-precision confirmation cells (round-4 verdict item 3a): seeds 1,2 x
# {high, highest} on ManyWell-32 at 3k iters, TPU, f32 — the multi-seed check
# the single-seed r1 "1.46x at quality parity" claim has been waiting on.
# Usage: bash experiments/run_matmul_cells.sh
set -u
cd "$(dirname "$0")/.."
export MPLBACKEND=Agg

for seed in 1 2; do
  for prec in high highest; do
    dir="results/mw_matmul/${prec}_s${seed}"
    if compgen -G "$dir/*metrics*" > /dev/null || [ -f "$dir/logging_hist.csv" ]; then
      echo "skip $prec s$seed (exists)"
      continue
    fi
    echo "[matmul-cell] $prec seed=$seed start $(date +%H:%M:%S)"
    python -u experiments/run_many_well.py \
      --config experiments/configs/many_well.yaml \
      training.seed="$seed" training.use_64_bit=false \
      training.matmul_precision="$prec" \
      training.n_flow_forward_pass=null training.n_iterations=3000 \
      evaluation.save_path="$dir/" evaluation.n_plots=0 \
      evaluation.n_eval=2 evaluation.n_checkpoints=1 \
      > "/tmp/mw_matmul_${prec}_s${seed}.log" 2>&1
    echo "[matmul-cell] $prec seed=$seed done rc=$? $(date +%H:%M:%S)"
    tail -3 "/tmp/mw_matmul_${prec}_s${seed}.log" || true
  done
done
echo "matmul cells complete"
