"""Log-Gaussian Cox process target (1600-D stretch workload).

From the fab-jax scope (BASELINE.json config 5); no analogue exists in the torch
reference. Standard LGCP posterior benchmark (Møller et al. 2004 parametrisation, as
used by NeuTra / Annealed Flow Transport / fab-jax): latent log-intensity field x on
an M x M grid over [0, 1]^2 with GP prior N(mu*1, K), K_ij = sigma^2 *
exp(-||s_i - s_j|| / (M * beta)), and Poisson count likelihood per cell:

    log p(x) = log N(x; mu, K) + sum_i [ x_i * y_i - (1/M^2) * exp(x_i) ] + const.

The pine-sapling dataset is not distributable here, so counts are drawn once from the
generative model at a fixed seed (documented, deterministic) — the posterior geometry
(1600-D, strong correlations, non-Gaussian likelihood) is what the benchmark
exercises.

TPU mapping: the Gaussian term uses a precomputed (f64 numpy at init) inverse
covariance; log-prob and score are then one [B,D]x[D,D] matmul each — pure MXU work,
no triangular solves in the hot path.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fab_tpu.targets.base import LogProbFn, TargetDistribution

Array = jnp.ndarray


class LogGaussianCoxProcess(TargetDistribution):
    def __init__(
        self,
        grid_size: int = 40,
        sigma2: float = 1.91,
        inv_beta: float = 33.0,
        data_seed: int = 0,
        dtype=jnp.float32,
    ):
        m = grid_size
        self.grid_size = m
        self.dim = m * m
        self.cell_area = 1.0 / (m * m)
        mu = np.log(126.0) - sigma2 / 2.0

        # Grid coordinates and exponential covariance kernel (f64, init-time only).
        idx = np.arange(m)
        xx, yy = np.meshgrid(idx, idx, indexing="ij")
        coords = np.stack([xx.ravel(), yy.ravel()], -1) / m
        dists = np.linalg.norm(coords[:, None, :] - coords[None, :, :], axis=-1)
        # Canonical Møller parametrisation on the unit square: sigma^2 *
        # exp(-||s_i - s_j|| / beta) with beta = 1/inv_beta = 1/33.
        k = sigma2 * np.exp(-dists * inv_beta)
        k += 1e-6 * np.eye(self.dim)

        chol = np.linalg.cholesky(k)
        k_inv = np.linalg.inv(k)
        self._log_det_k = 2.0 * np.sum(np.log(np.diag(chol)))
        self.mu = float(mu)
        self.k_inv = jnp.asarray(k_inv, dtype)
        self.chol = jnp.asarray(chol, dtype)

        # Deterministic synthetic counts from the generative model.
        rng = np.random.RandomState(data_seed)
        x_true = mu + chol @ rng.randn(self.dim)
        self.counts = jnp.asarray(
            rng.poisson(self.cell_area * np.exp(x_true)), dtype
        )
        self._x_true = jnp.asarray(x_true, dtype)
        self._gauss_const = -0.5 * (
            self.dim * np.log(2 * np.pi) + self._log_det_k
        )

    def log_prob(self, x: Array) -> Array:
        """Unnormalised posterior log-density (prior + Poisson likelihood)."""
        diff = x - self.mu
        quad = jnp.einsum(
            "...i,ij,...j->...", diff, self.k_inv, diff,
        )
        log_prior = self._gauss_const - 0.5 * quad
        log_lik = jnp.sum(
            x * self.counts - self.cell_area * jnp.exp(x), axis=-1
        )
        return log_prior + log_lik

    def sample_prior(self, key: jax.Array, n: int) -> Array:
        eps = jax.random.normal(key, (n, self.dim), self.chol.dtype)
        return self.mu + eps @ self.chol.T

    def performance_metrics(
        self,
        samples: Array,
        log_w: Array,
        log_q_fn: Optional[LogProbFn] = None,
        batch_size: Optional[int] = None,
        mask: Optional[Array] = None,
        key: Optional[jax.Array] = None,
    ) -> Dict[str, Array]:
        """Posterior-moment diagnostics: importance-weighted mean field vs the
        (known, synthetic) generating field; mean log-intensity error."""
        if mask is None:
            mask = jnp.ones(log_w.shape, bool)
        w_bar = jax.nn.softmax(jnp.where(mask, log_w, -jnp.inf), axis=0)
        post_mean = jnp.sum(w_bar[:, None] * jnp.where(mask[:, None], samples, 0.0), axis=0)
        info = {
            "post_mean_field_rmse": jnp.sqrt(
                jnp.mean((post_mean - self._x_true) ** 2)
            ),
            "post_mean_log_intensity": jnp.mean(post_mean),
        }
        if log_q_fn is not None:
            info["sample_mean_log_q"] = jnp.mean(
                jnp.where(mask, log_q_fn(samples), 0.0)
            )
        return info
