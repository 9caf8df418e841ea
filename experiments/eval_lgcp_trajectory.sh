#!/bin/bash
# Evaluate every iter_N checkpoint of an LGCP-1600 run on CPU (local compiles;
# the tunnel-shared TPU chokes on the 1600-D eval program) in ONE process so the
# eval program compiles once. Emits reports/lgcp_trajectory.csv:
# post_mean_field_rmse + ESS per checkpoint = the convergence trajectory.
# Usage: bash experiments/eval_lgcp_trajectory.sh <run_dir> [n_samples]
set -u
cd "$(dirname "$0")/.."
export MPLBACKEND=Agg JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= FAB_TPU_TESTS_REEXECED=1
RUN=${1:?usage: eval_lgcp_trajectory.sh <run_dir> [n_samples]}
N=${2:-2048}

RUNS=()
for c in $(ls -d "$RUN"/model_checkpoints/iter_* 2>/dev/null | sort -t_ -k2 -n); do
  it=$(basename "$c" | sed 's/iter_//')
  RUNS+=("--run" "lgcp_iter${it}=${c}/state.pkl")
done
echo "evaluating ${#RUNS[@]} args from $RUN"
mkdir -p reports
python -u experiments/evaluate.py --config experiments/configs/lgcp.yaml \
  target.in_graph_kernel=true \
  "${RUNS[@]}" --num-samples "$N" --inner-batch 512 \
  --out reports/lgcp_trajectory.csv
