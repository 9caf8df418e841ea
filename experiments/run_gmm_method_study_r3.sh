#!/bin/bash
# GMM-40 method study, round-3 additions: the reference's remaining three methods
# (target_kld, rsb = resampled base + reverse KL, snf = SNF flow + reverse KL;
# experiments/gmm/evaluation.py:50, rbd/snf loss per aldp config rbd.yaml/snf.yaml)
# x 3 seeds at the paper's 2e7-flow-forward-pass budget, f64, CPU.
# Usage: bash experiments/run_gmm_method_study_r3.sh "method seed" ["method seed" ...]
#   where method is one of: target_kld rsb snf
set -u
cd "$(dirname "$0")/.."
export MPLBACKEND=Agg JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= FAB_TPU_TESTS_REEXECED=1

run() {  # method seed
  local method=$1 seed=$2
  local dir="results/gmm_study/${method}/seed${seed}"
  if compgen -G "$dir/*/model_checkpoints/iter_*" > /dev/null; then
    echo "skip $method seed $seed (checkpoint exists)"
    return
  fi
  local extra=()
  case "$method" in
    target_kld) extra=(fab.loss_type=target_forward_kl) ;;
    rsb)        extra=(fab.loss_type=flow_reverse_kl flow.resampled_base=true) ;;
    snf)        extra=(fab.loss_type=flow_reverse_kl flow.use_snf=true) ;;
    *) echo "unknown method $method"; return 1 ;;
  esac
  echo "[gmm-r3] $method seed $seed start $(date +%H:%M:%S)"
  python -u experiments/run_gmm.py --config experiments/configs/gmm.yaml \
    "${extra[@]}" training.seed="$seed" \
    evaluation.save_path="$dir/" \
    evaluation.n_plots=0 evaluation.n_eval=2 evaluation.n_checkpoints=1 \
    > "/tmp/gmm_r3_${method}_s${seed}.log" 2>&1
  echo "[gmm-r3] $method seed $seed done rc=$? $(date +%H:%M:%S)"
}

for job in "$@"; do
  run $job
done
echo "lane complete: $*"
