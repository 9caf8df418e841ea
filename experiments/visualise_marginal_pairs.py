"""Visualise ALL marginal pairs of a ManyWell flow checkpoint.

Analogue of experiments/many_well/many_well_visualise_all_marginal_pairs.py:70
(reference): a (n_wells x n_wells) grid where cell (i, j) scatters flow samples over
target contours for dimensions (2i, 2j+1) — the full cross-well dependency picture,
not just the within-well pairs the training plotter shows.

Usage:
    python experiments/visualise_marginal_pairs.py \
        --config experiments/configs/many_well.yaml --checkpoint results/mw32/seed0 \
        [--n-samples 500] [--out mw_marginal_pairs.png]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import matplotlib.pyplot as plt

from fab_tpu.targets import ManyWellEnergy
from fab_tpu.utils.plotting import plot_contours, plot_marginal_pair
from fab_tpu.utils.training import apply_overrides, load_config

from experiments.load_model_for_eval import load_model
from experiments.setup_run import setup_precision


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="experiments/configs/many_well.yaml")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--n-samples", type=int, default=500)
    parser.add_argument("--max-wells", type=int, default=8,
                        help="cap the grid size for very high-dim targets")
    parser.add_argument("--out", default="many_well_marginal_pairs.png")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    cfg = apply_overrides(load_config(args.config), args.overrides)
    setup_precision(cfg)
    target = ManyWellEnergy(dim=cfg.target.dim)
    model, params = load_model(cfg, target, args.checkpoint)
    x = model.flow.sample(params["flow"], jax.random.key(0), args.n_samples)

    n = min(target.n_wells, args.max_wells)
    plot_bound = 3.0
    fig, axs = plt.subplots(n, n, figsize=(2 * n, 2 * n), sharex=True, sharey=True)
    for i in range(n):
        for j in range(n):
            ax = axs[i, j]
            dims = (2 * i, 2 * j + 1)
            plot_contours(
                target.log_prob_2d, bounds=(-plot_bound, plot_bound), ax=ax,
                n_contour_levels=20, grid_width_n_points=40,
            )
            plot_marginal_pair(
                x, ax=ax, bounds=(-plot_bound, plot_bound), marginal_dims=dims,
                alpha=0.2,
            )
            if i == n - 1:
                ax.set_xlabel(f"$x_{{{dims[0] + 1}}}$")
            if j == 0:
                ax.set_ylabel(f"$x_{{{dims[1] + 1}}}$")
    plt.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
