"""Plotting helpers (fab/utils/plotting.py:13-63)."""
from __future__ import annotations

from typing import Optional, Tuple

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def plot_history(history) -> None:
    """Grid of per-key training curves (fab/utils/plotting.py:13-27)."""
    figure, axs = plt.subplots(len(history), 1, figsize=(7, 3 * len(history)))
    if len(history) == 1:
        axs = [axs]
    for i, key in enumerate(history):
        axs[i].plot(history[key])
        axs[i].set_title(key)
    plt.tight_layout()


def plot_contours(
    log_prob_func,
    ax: Optional[plt.Axes] = None,
    bounds: Tuple[float, float] = (-5.0, 5.0),
    grid_width_n_points: int = 20,
    n_contour_levels: Optional[int] = None,
    log_prob_min: float = -1000.0,
):
    """2-D contours of a log-prob function (fab/utils/plotting.py:30-52)."""
    import jax.numpy as jnp

    if ax is None:
        fig, ax = plt.subplots(1)
    pts_1d = np.linspace(bounds[0], bounds[1], grid_width_n_points)
    xx, yy = np.meshgrid(pts_1d, pts_1d)
    grid = jnp.asarray(
        np.stack([xx.ravel(), yy.ravel()], axis=-1), dtype=jnp.float32
    )
    log_p = np.asarray(log_prob_func(grid))
    log_p = np.clip(log_p, log_prob_min, None).reshape(
        grid_width_n_points, grid_width_n_points
    )
    if n_contour_levels:
        ax.contour(xx, yy, log_p, levels=n_contour_levels)
    else:
        ax.contour(xx, yy, log_p)
    return ax


def plot_marginal_pair(
    samples,
    ax: Optional[plt.Axes] = None,
    marginal_dims: Tuple[int, int] = (0, 1),
    bounds: Tuple[float, float] = (-5.0, 5.0),
    alpha: float = 0.5,
):
    """Scatter of a pair of marginals (fab/utils/plotting.py:55-63)."""
    if ax is None:
        fig, ax = plt.subplots(1)
    samples = np.clip(np.asarray(samples), bounds[0], bounds[1])
    ax.plot(
        samples[:, marginal_dims[0]], samples[:, marginal_dims[1]], "o", alpha=alpha
    )
    return ax
