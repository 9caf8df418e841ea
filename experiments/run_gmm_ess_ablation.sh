#!/bin/bash
# GMM-40 ESS root-cause ablation (VERDICT r2 weakness 1 / task 2): which training
# knob speeds up eval-ESS convergence of the fab_buffer flagship? Runs the paper
# config at 1/4 budget (13,019 iters, f64, CPU) with one knob changed per run;
# eval = 20k samples at the end. The companion budget-trajectory study (seed0
# resumed to 2x/3x budget) shows ESS is convergence-limited, not ceilinged.
# Usage: bash experiments/run_gmm_ess_ablation.sh [variant ...]
set -u
cd "$(dirname "$0")/.."
export MPLBACKEND=Agg JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= FAB_TPU_TESTS_REEXECED=1

ITERS=13019   # 1/4 of the 52,076-iter paper budget

run() {  # variant extra-overrides...
  local variant=$1; shift
  local dir="results/gmm_ablation/${variant}"
  if compgen -G "$dir/*/model_checkpoints/iter_*" > /dev/null; then
    echo "skip $variant (checkpoint exists)"
    return
  fi
  echo "[ess-abl] $variant start $(date +%H:%M:%S)"
  python -u experiments/run_gmm.py --config experiments/configs/gmm.yaml \
    fab.loss_type=fab_alpha_div training.use_buffer=true \
    training.prioritised_buffer=true training.seed=0 \
    training.n_flow_forward_pass=null training.n_iterations=$ITERS \
    evaluation.save_path="$dir/" evaluation.eval_batch_size=512 \
    evaluation.n_plots=0 evaluation.n_eval=1 evaluation.n_checkpoints=1 \
    "$@" > "/tmp/gmm_abl_${variant}.log" 2>&1
  echo "[ess-abl] $variant done rc=$? $(date +%H:%M:%S)"
  grep -o "eval_ess_flow_p_target[^,]*" "/tmp/gmm_abl_${variant}.log" | tail -1 || true
}

for v in "${@:-control w_clip10 lr5e-5 act_norm scale_cap5}"; do
  case "$v" in
    control)    run control ;;
    w_clip10)   run w_clip10 training.w_adjust_max_clip=10 ;;
    lr5e-5)     run lr5e-5 training.lr=5e-5 ;;
    act_norm)   run act_norm flow.act_norm=true ;;
    scale_cap5) run scale_cap5 flow.scale_cap=5.0 ;;
    buf_4x)     run buf_4x training.maximum_buffer_length=51200 training.min_buffer_length=5120 ;;
    step1)      run step1 fab.transition_operator.init_step_size=1.0 ;;
    *) echo "unknown variant $v" ;;
  esac
done
echo "ablation lane complete"
