"""Summarise the GMM-40 ESS root-cause study (VERDICT r2 weakness 1).

Two artifacts:
  reports/gmm_ess_ablation.csv   — final-eval metrics per ablation variant
                                   (results/gmm_ablation/<variant>/, 1/4 budget)
  reports/gmm_ess_trajectory.csv — eval-vs-iteration trajectory of the extended
                                   2x-budget fab_buffer run (trajectory_2x)

Eval metrics are read from each run's logging_hist.csv (rows where the eval
columns are populated carry `step` = the evaluated iteration). Protocol match:
reference experiments/gmm/evaluation.py evaluates trained checkpoints with 50k
samples; these in-training evals use 5120 (trajectory) / 512 (ablation final)
samples — coarser, but the comparison is *between variants at equal budget*, and
the trajectory's final checkpoints are additionally evaluated with the full
50k-sample protocol by experiments/eval_gmm_study.sh machinery where recorded.

Usage: python experiments/summarize_ess_study.py
"""
from __future__ import annotations

import glob
import os
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EVAL_COLS = [
    "eval_ess_flow_p_target",
    "eval_ess_ais_p_target",
    "flow_bias_normed_p_target",
    "flow_kl_forward_p_target",
    "flow_test_set_mean_log_prob_p_target",
]


def eval_rows(run_glob: str) -> pd.DataFrame | None:
    """Eval-iteration rows of the newest logging_hist.csv under run_glob."""
    hists = sorted(
        glob.glob(os.path.join(run_glob, "*", "logging_hist.csv")),
        key=os.path.getmtime,
    )
    if not hists:
        return None
    df = pd.read_csv(hists[-1])
    if "eval_ess_flow_p_target" not in df.columns:
        return None
    rows = df[df["eval_ess_flow_p_target"].notna()].copy()
    return rows[["step"] + [c for c in EVAL_COLS if c in rows.columns]]


def main() -> int:
    os.makedirs(os.path.join(REPO, "reports"), exist_ok=True)

    # ---- ablation: one final-eval row per variant -------------------------
    out = []
    for vdir in sorted(glob.glob(os.path.join(REPO, "results/gmm_ablation/*"))):
        variant = os.path.basename(vdir)
        if variant == "trajectory_2x":
            continue
        rows = eval_rows(vdir)
        if rows is None or not len(rows):
            print(f"[skip] {variant}: no eval rows yet", file=sys.stderr)
            continue
        rec = rows.iloc[-1].to_dict()
        rec = {"variant": variant, "iteration": int(rec.pop("step")), **rec}
        out.append(rec)
    if out:
        path = os.path.join(REPO, "reports/gmm_ess_ablation.csv")
        pd.DataFrame(out).to_csv(path, index=False)
        print(f"wrote {path} ({len(out)} variants)")

    # ---- trajectory: full eval-vs-iteration curve -------------------------
    rows = eval_rows(os.path.join(REPO, "results/gmm_ablation/trajectory_2x"))
    if rows is not None and len(rows):
        path = os.path.join(REPO, "reports/gmm_ess_trajectory.csv")
        rows.rename(columns={"step": "iteration"}).to_csv(path, index=False)
        print(f"wrote {path} ({len(rows)} eval points)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
