#!/bin/bash
# GMM-40 method-comparison study: 3 methods x 3 seeds at the paper's
# 2e7-flow-forward-pass budget (the fair-comparison normaliser, setup_run.py), f64.
# fab_buffer runs are produced separately (results/gmm_buffer_f64/seed{0,1,2}).
# Runs two lanes in parallel (2 CPU cores). Usage: bash run_gmm_method_study.sh
set -u
cd "$(dirname "$0")/.."
export MPLBACKEND=Agg JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= FAB_TPU_TESTS_REEXECED=1

run() {  # method seed extra-overrides...
  local method=$1 seed=$2; shift 2
  python -u experiments/run_gmm.py --config experiments/configs/gmm.yaml \
    fab.loss_type="$method" training.seed="$seed" \
    evaluation.save_path="results/gmm_study/${method}/seed${seed}/" \
    evaluation.n_plots=0 evaluation.n_eval=5 evaluation.n_checkpoints=2 \
    "$@" > "/tmp/gmm_study_${method}_s${seed}.log" 2>&1
}

lane() {  # consumes "method seed" lines on stdin
  while read -r method seed; do
    [ -z "$method" ] && continue
    echo "[lane $$] $method seed $seed start $(date +%H:%M:%S)"
    if [ "$method" = fab_no_buffer ]; then
      run fab_alpha_div "$seed" training.use_buffer=false \
        evaluation.save_path="results/gmm_study/fab_no_buffer/seed${seed}/"
    else
      run "$method" "$seed"
    fi
    echo "[lane $$] $method seed $seed done $(date +%H:%M:%S)"
  done
}

# interleave methods across lanes
lane <<EOF &
fab_no_buffer 0
flow_reverse_kl 0
flow_alpha_2_div_nis 0
fab_no_buffer 2
flow_alpha_2_div_nis 2
EOF
L1=$!
lane <<EOF &
fab_no_buffer 1
flow_reverse_kl 1
flow_alpha_2_div_nis 1
flow_reverse_kl 2
EOF
L2=$!
wait $L1 $L2
echo "method study complete"
