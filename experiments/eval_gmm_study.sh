#!/bin/bash
# Evaluate the GMM-40 method-study checkpoints (results/gmm_study/<method>/<seed>)
# with the reference evaluation protocol: 50k flow/AIS samples, inner batch 500,
# f64, AIS target p (experiments/gmm/evaluation.py:50-121 analogue).
# Emits reports/gmm_study_results.csv + a LaTeX table.
# Usage: bash experiments/eval_gmm_study.sh [n_samples]
set -u
cd "$(dirname "$0")/.."
export MPLBACKEND=Agg JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= FAB_TPU_TESTS_REEXECED=1
N=${1:-50000}

RUNS=()
for d in results/gmm_study/*/seed* results/gmm_buffer_f64/seed*; do
  [ -d "$d" ] || continue
  method=$(basename "$(dirname "$d")")
  if [ "$method" = gmm_buffer_f64 ]; then
    method=fab_buffer
  elif [ "$method" = fab_buffer ] && [ -d results/gmm_buffer_f64 ]; then
    # gmm_buffer_f64 already provides the fab_buffer rows; skip duplicates.
    continue
  fi
  seed=$(basename "$d" | sed 's/seed//')
  # mtime sort (run-dir stamps were %d-%m-%Y before round 3, so lexical sort
  # is not chronological across formats).
  latest=$(ls -dt "$d"/*/ 2>/dev/null | head -1)
  [ -n "$latest" ] || continue
  if compgen -G "${latest}model_checkpoints/iter_*" > /dev/null; then
    RUNS+=("--run" "${method}_seed${seed}=${latest%/}")
  fi
done
echo "evaluating ${#RUNS[@]} args"

mkdir -p reports
python -u experiments/evaluate.py --config experiments/configs/gmm.yaml \
  "${RUNS[@]}" --num-samples "$N" --inner-batch 500 \
  --out reports/gmm_study_results.csv \
  fab.loss_type=fab_alpha_div
python experiments/latex_table.py --csv reports/gmm_study_results.csv \
  --problem gmm | tee reports/gmm_study_table.tex
