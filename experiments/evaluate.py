"""Checkpoint evaluation across methods x seeds -> metrics CSV + summary table.

Analogue of the reference's per-problem evaluation scripts
(experiments/gmm/evaluation.py:50-121, experiments/many_well/evaluation.py:15-77):
load each (method, seed) checkpoint, compute ESS + target metrics with the AIS target
set to p, aggregate mean/standard-error per method, write a CSV consumed by
latex_table.py.

Usage:
    python experiments/evaluate.py --config experiments/configs/gmm.yaml \
        --run fab_buffer=results/gmm/seed0 --run fab_no_buffer=... \
        [--num-samples 50000] [--out gmm_results.csv]

The problem is inferred from the config (gmm / many_well / lgcp).
"""
from __future__ import annotations

import argparse
import csv
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from fab_tpu.utils.training import apply_overrides, load_config, maybe_enable_x64

from experiments.load_model_for_eval import load_model

SUMMARY_KEYS = [
    "eval_ess_flow",
    "eval_ess_ais",
    "flow_test_set_mean_log_prob",
    "flow_kl_forward",
    "flow_test_set_exact_mean_log_prob",
    "flow_test_set_modes_mean_log_prob",
    "flow_forward_kl",
    "ais_relative_MSE_Z_estimate",
    "ais_abs_MSE_log_Z_estimate",
    "flow_bias_normed",
    "ais_bias_normed",
]


def build_target(cfg):
    if "n_mixes" in cfg.target:
        from fab_tpu.targets import GMM

        return GMM(
            dim=cfg.target.dim,
            n_mixes=cfg.target.n_mixes,
            loc_scaling=cfg.target.loc_scaling,
            log_var_scaling=cfg.target.log_var_scaling,
            seed=0,  # always 0 for the GMM problem (gmm/evaluation.py:18)
            true_expectation_estimation_n_samples=int(
                cfg.target.get("true_expectation_n_samples", 1e7)
            ),
        )
    if "grid_size" in cfg.target:
        from fab_tpu.targets import LogGaussianCoxProcess

        return LogGaussianCoxProcess(grid_size=cfg.target.grid_size,
            in_graph_kernel=bool(cfg.target.get('in_graph_kernel', False)))
    from fab_tpu.targets import ManyWellEnergy

    return ManyWellEnergy(dim=cfg.target.dim)


def evaluate_checkpoint(cfg, target, path, num_samples, inner_batch, seed=0):
    model, params = load_model(cfg, target, path)
    return model.get_eval_info(
        params,
        jax.random.key(seed),
        outer_batch_size=num_samples,
        inner_batch_size=inner_batch,
        p_target=True,  # evaluation flips the AIS target to p (core.py:198-199)
    )


def _write_rows(path, rows):
    cols = ["model_name"] + sorted({k for r in rows for k in r} - {"model_name"})
    with open(path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=cols, restval="")
        writer.writeheader()
        writer.writerows(rows)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument(
        "--run", action="append", default=[],
        help="name=path (path = checkpoint file or run dir); repeatable",
    )
    parser.add_argument("--num-samples", type=int, default=10_000)
    parser.add_argument("--inner-batch", type=int, default=500)
    parser.add_argument("--out", default="eval_results.csv")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    cfg = apply_overrides(load_config(args.config), args.overrides)
    maybe_enable_x64(cfg)  # checkpoints from use_64_bit runs restore at full width
    target = build_target(cfg)

    rows = []
    for spec in args.run:
        name, path = spec.split("=", 1)
        # Per-method flow-architecture flags, as the reference's evaluation loop
        # does (gmm/evaluation.py:60-67): snf_* checkpoints need the SNF flow,
        # rsb_* the resampled (LARS) base — else param trees don't match.
        import copy

        cfg_run = copy.deepcopy(cfg)
        method = name.rsplit("_seed", 1)[0]
        cfg_run.flow.use_snf = method.startswith("snf")
        cfg_run.flow.resampled_base = method.startswith("rsb")
        info = evaluate_checkpoint(
            cfg_run, target, path, args.num_samples, args.inner_batch
        )
        info = {k: float(v) for k, v in info.items()}
        info["model_name"] = name
        rows.append(info)
        print(name, {k: round(v, 4) for k, v in info.items() if k != "model_name"})
        # Rewrite after every checkpoint so an interrupted evaluation keeps
        # its finished rows.
        _write_rows(args.out, rows)

    if rows:
        # mean / sem per method over seeds (gmm/evaluation.py:75-80).
        grouped = defaultdict(list)
        for r in rows:
            grouped[r["model_name"].rsplit("_seed", 1)[0]].append(r)
        print("\n*** mean (sem) per method ***")
        for name, rs in grouped.items():
            line = [name]
            for k in SUMMARY_KEYS:
                vals = [r[k] for r in rs if k in r]
                if vals:
                    mean = np.mean(vals)
                    sem = np.std(vals) / max(len(vals) - 1, 1) ** 0.5
                    line.append(f"{k}={mean:.4f}({sem:.4f})")
            print("  ".join(line))
    return rows


if __name__ == "__main__":
    main()
