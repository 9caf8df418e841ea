#!/bin/bash
# Torch-init parity A/B (VERDICT r3 task 1): does matching torch.nn.Linear's
# default conditioner init (kaiming_uniform a=sqrt5 + uniform bias; ~sqrt(6)x
# smaller weight std than our he_normal) change the three open outcomes?
#   (a) SNF GMM divergence (r3: diverged by ~4k iters under he_normal —
#       NOTE round 4 ALSO fixed the SNF MH log-det sign, so the A/B here is
#       run on the sign-FIXED code: snf_he isolates the sign fix, snf_torch
#       adds init parity on top),
#   (b) rsb reverse-KL wall at ~31k iters (he arm = r3 recorded run),
#   (c) fab_buffer GMM ESS at 1/4 budget (he arm = r3 ablation control 0.334).
# All cells: reference gmm.yaml protocol, f64, CPU, tlimit-boxed.
# Usage: bash experiments/run_init_parity_ab.sh [cell ...]
set -u
cd "$(dirname "$0")/.."
export MPLBACKEND=Agg JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= FAB_TPU_TESTS_REEXECED=1

run() {  # cell tlimit extra-overrides...
  local cell=$1 tl=$2; shift 2
  local dir="results/init_ab/${cell}"
  if compgen -G "$dir/*/model_checkpoints/iter_*" > /dev/null; then
    echo "skip $cell (checkpoint exists)"
    return
  fi
  echo "[init-ab] $cell start $(date +%H:%M:%S)"
  python -u experiments/run_gmm.py --config experiments/configs/gmm.yaml \
    training.seed=0 training.tlimit="$tl" \
    evaluation.save_path="$dir/" evaluation.eval_batch_size=512 \
    evaluation.n_plots=0 evaluation.n_eval=1 evaluation.n_checkpoints=1 \
    "$@" > "/tmp/init_ab_${cell}.log" 2>&1
  echo "[init-ab] $cell done rc=$? $(date +%H:%M:%S)"
  tail -2 "/tmp/init_ab_${cell}.log" || true
}

CELLS=("$@")
if [ ${#CELLS[@]} -eq 0 ]; then
  CELLS=(snf_he snf_torch rsb_torch fabbuf_torch)
fi
for c in "${CELLS[@]}"; do
  case "$c" in
    # (a) SNF under the reference protocol (sign-fixed code), he vs torch init.
    snf_he)    run snf_he 1.0 fab.loss_type=flow_reverse_kl flow.use_snf=true \
                 training.log_every=100 ;;
    snf_torch) run snf_torch 1.0 fab.loss_type=flow_reverse_kl flow.use_snf=true \
                 flow.init_mode=torch training.log_every=100 ;;
    # (b) rsb with torch init (he arm: r3 run results/gmm_study/rsb/seed0).
    rsb_torch) run rsb_torch 1.5 fab.loss_type=flow_reverse_kl \
                 flow.resampled_base=true flow.init_mode=torch \
                 training.log_every=100 ;;
    # (c) fab_buffer 1/4 budget with torch init (he arm: ablation control).
    fabbuf_torch) run fabbuf_torch 2.5 fab.loss_type=fab_alpha_div \
                 training.use_buffer=true training.prioritised_buffer=true \
                 training.n_flow_forward_pass=null training.n_iterations=13019 \
                 flow.init_mode=torch ;;
    *) echo "unknown cell $c" ;;
  esac
done
echo "init-parity A/B lane complete"
