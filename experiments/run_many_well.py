"""Many-Well experiment entry point (reference: experiments/many_well/run.py:9-73).

Usage:
    python experiments/run_many_well.py --config experiments/configs/many_well.yaml \
        [target.dim=6 training.seed=1 ...]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib.pyplot as plt

from fab_tpu.targets import ManyWellEnergy
from fab_tpu.utils.plotting import plot_contours, plot_marginal_pair
from fab_tpu.utils.training import apply_overrides, load_config, maybe_enable_x64

from experiments.setup_run import setup_trainer_and_run_flow


def make_plotter(target: ManyWellEnergy):
    """Per-well marginal-pair scatter over target contours (run.py:20-48)."""

    def plot(model, params, key):
        n_samples = 300
        plot_bound = 3.0
        n_rows = min(target.n_wells, 2)
        fig, axs = plt.subplots(
            n_rows, 2, figsize=(8, 3 * n_rows), sharex=True, sharey=True,
            squeeze=False,
        )
        x_flow = model.flow.sample(params["flow"], key, n_samples)
        x_ais = None
        if model.ais is not None:
            result = model.ais.sample_and_log_weights(
                params["flow"], params["transition"], key, n_samples,
                p_target=False, tune=False,
            )
            x_ais = result.point.x
        for i in range(n_rows):
            for col, samples in enumerate([x_flow, x_ais]):
                if samples is None:
                    continue
                plot_contours(
                    target.log_prob_2d, bounds=(-plot_bound, plot_bound),
                    ax=axs[i, col], n_contour_levels=20, grid_width_n_points=50,
                )
                plot_marginal_pair(
                    samples, ax=axs[i, col], bounds=(-plot_bound, plot_bound),
                    marginal_dims=(i * 2, i * 2 + 1),
                )
            axs[i, 0].set_ylabel(f"dims {i*2},{i*2+1}")
        axs[0, 0].set_title("flow samples")
        axs[0, 1].set_title("AIS samples")
        plt.tight_layout()
        return [fig]

    return plot


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="experiments/configs/many_well.yaml")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    cfg = apply_overrides(load_config(args.config), args.overrides)
    maybe_enable_x64(cfg)  # before target ctor so its constants are f64

    target = ManyWellEnergy(dim=cfg.target.dim)
    plotter = make_plotter(target)
    setup_trainer_and_run_flow(cfg, target, plotter)


if __name__ == "__main__":
    main()
