"""Paper-figure generator: flow/AIS samples over target contours per checkpoint.

Analogue of the reference's per-problem figure scripts —
experiments/gmm/results_vis.py (flow-sample scatter over GMM contours per method)
and experiments/many_well/results_vis.py + results_vis_appendix.py (grids of
marginal-pair scatters per method). One row per method, loaded from checkpoints.

Usage:
    python experiments/results_vis.py --config experiments/configs/gmm.yaml \
        --run "FAB w/ buffer=results/gmm/seed0" --run "Rev KL=results/gmm_kld" \
        [--n-samples 1000] [--ais] [--out gmm_results_vis.png]

The problem (gmm / many_well) is inferred from the config path/contents.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import matplotlib.pyplot as plt

from fab_tpu.utils.plotting import plot_contours, plot_marginal_pair
from fab_tpu.utils.training import apply_overrides, load_config

from experiments.evaluate import build_target
from experiments.load_model_for_eval import load_model
from experiments.setup_run import setup_precision


def _sample(model, params, key, n, use_ais):
    x_flow = model.flow.sample(params["flow"], key, n)
    x_ais = None
    if use_ais and model.ais is not None:
        result = model.ais.sample_and_log_weights(
            params["flow"], params["transition"], key, n,
            p_target=True, tune=False,
        )
        x_ais = result.point.x
    return x_flow, x_ais


def plot_gmm_row(axs, target, x_flow, x_ais, plot_bound):
    for ax, samples, title in zip(axs, (x_flow, x_ais), ("flow", "AIS")):
        if samples is None:
            ax.axis("off")
            continue
        plot_contours(
            target.log_prob, bounds=(-plot_bound, plot_bound),
            n_contour_levels=50, grid_width_n_points=200, ax=ax,
        )
        plot_marginal_pair(samples, ax=ax, bounds=(-plot_bound, plot_bound), alpha=0.3)
        ax.set_title(title)


def plot_many_well_row(axs, target, x_flow, plot_bound=3.0):
    """First-three marginal pairs, reference results_vis.py appendix layout."""
    for j, ax in enumerate(axs):
        plot_contours(
            target.log_prob_2d, bounds=(-plot_bound, plot_bound), ax=ax,
            n_contour_levels=20, grid_width_n_points=100,
        )
        plot_marginal_pair(
            x_flow, ax=ax, bounds=(-plot_bound, plot_bound),
            marginal_dims=(2 * j, 2 * j + 1), alpha=0.3,
        )
        ax.set_title(f"$x_{{{2 * j + 1}}}, x_{{{2 * j + 2}}}$")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument(
        "--run", action="append", required=True,
        help="LABEL=CHECKPOINT_DIR (repeatable; one figure row per run)",
    )
    parser.add_argument("--n-samples", type=int, default=1000)
    parser.add_argument("--ais", action="store_true", help="also plot AIS samples")
    parser.add_argument("--out", default="results_vis.png")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    cfg = apply_overrides(load_config(args.config), args.overrides)
    setup_precision(cfg)
    problem = "gmm" if "n_mixes" in cfg.target else "many_well"
    target = build_target(cfg)
    runs = [r.split("=", 1) for r in args.run]

    if problem == "gmm":
        n_cols = 2 if args.ais else 1
        plot_bound = cfg.target.loc_scaling * 1.4
    else:
        n_cols = 3
    fig, axs = plt.subplots(
        len(runs), n_cols, figsize=(4 * n_cols, 4 * len(runs)), squeeze=False,
    )
    key = jax.random.key(0)
    for i, (label, ckpt) in enumerate(runs):
        model, params = load_model(cfg, target, ckpt)
        x_flow, x_ais = _sample(model, params, key, args.n_samples, args.ais)
        if problem == "gmm":
            plot_gmm_row(axs[i], target, x_flow, x_ais, plot_bound)
        else:
            plot_many_well_row(axs[i], target, x_flow)
        axs[i, 0].set_ylabel(label)
    plt.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
