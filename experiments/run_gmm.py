"""GMM-40 experiment entry point (reference: experiments/gmm/run.py:11-69).

Usage:
    python experiments/run_gmm.py --config experiments/configs/gmm.yaml \
        [training.seed=1 fab.loss_type=flow_reverse_kl ...]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import matplotlib.pyplot as plt

from fab_tpu.targets import GMM
from fab_tpu.utils.plotting import plot_contours, plot_marginal_pair
from fab_tpu.utils.training import apply_overrides, load_config, maybe_enable_x64

from experiments.setup_run import setup_trainer_and_run_flow


def make_plotter(target: GMM, plot_bound: float):
    def plot(model, params, key):
        n_samples = 300
        fig, axs = plt.subplots(1, 2, figsize=(8, 4))
        x_flow = model.flow.sample(params["flow"], key, n_samples)
        plot_contours(
            target.log_prob, bounds=(-plot_bound, plot_bound),
            n_contour_levels=50, grid_width_n_points=100, ax=axs[0],
        )
        plot_marginal_pair(x_flow, ax=axs[0], bounds=(-plot_bound, plot_bound))
        axs[0].set_title("flow samples")
        if model.ais is not None:
            result = model.ais.sample_and_log_weights(
                params["flow"], params["transition"], key, n_samples,
                p_target=False, tune=False,
            )
            plot_contours(
                target.log_prob, bounds=(-plot_bound, plot_bound),
                n_contour_levels=50, grid_width_n_points=100, ax=axs[1],
            )
            plot_marginal_pair(
                result.point.x, ax=axs[1], bounds=(-plot_bound, plot_bound)
            )
            axs[1].set_title("AIS samples")
        plt.tight_layout()
        return [fig]

    return plot


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="experiments/configs/gmm.yaml")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    cfg = apply_overrides(load_config(args.config), args.overrides)
    dtype = maybe_enable_x64(cfg)

    target = GMM(
        dim=cfg.target.dim,
        n_mixes=cfg.target.n_mixes,
        loc_scaling=cfg.target.loc_scaling,
        log_var_scaling=cfg.target.log_var_scaling,
        # Target mixture is ALWAYS seed 0 (reference gmm/run.py:53 "seed of 0 for
        # GMM problem"); training.seed only seeds the training run. Evaluation
        # (experiments/evaluate.py) rebuilds the same seed-0 target.
        seed=0,
        true_expectation_estimation_n_samples=int(
            cfg.target.get("true_expectation_n_samples", 1e7)
        ),
        expectation_key=jax.random.key(0),
        dtype=dtype,
    )
    plotter = make_plotter(target, plot_bound=cfg.target.loc_scaling * 1.4)
    setup_trainer_and_run_flow(cfg, target, plotter)


if __name__ == "__main__":
    main()
