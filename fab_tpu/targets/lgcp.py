"""Log-Gaussian Cox process target (1600-D stretch workload), whitened.

From the fab-jax scope (BASELINE.json config 5); no analogue exists in the torch
reference. Standard LGCP posterior benchmark (Møller et al. 2004 parametrisation, as
used by NeuTra / Annealed Flow Transport / fab-jax): latent log-intensity field on an
M x M grid over [0, 1]^2 with GP prior N(mu*1, K), K_ij = sigma^2 *
exp(-||s_i - s_j|| / (M * beta)), and a Poisson count likelihood per cell.

**Whitened parametrisation** (the treatment used by Annealed Flow Transport and
fab-jax): the sampled variable is the whitened latent e with prior N(0, I); the
field is x = mu + L e with L = chol(K). The posterior density the flow learns is

    log p(e) = -||e||^2/2 - (D/2) log 2pi + sum_i [ x_i y_i - (1/M^2) exp(x_i) ].

Two reasons this is the right TPU design, beyond matching the literature:

1. **One well-behaved constant instead of an inverse pair.** The density needs only
   L (applied forward); the unwhitened form needs K^{-1} in value AND transposed in
   gradients — multiple 10 MB HLO literals that blew past remote-compile transport
   limits on the flagship train step.
2. **No ill-conditioned inverse in f32.** Applying L is forward-stable regardless
   of cond(K) (~1e6 here); inverting K in f32 is not. L itself is computed once at
   init in f64 numpy.

``in_graph_kernel=True`` instead rebuilds chol(K) inside the traced computation
from the [D, 2] grid-coordinate constant (13 KB): zero large literals in any
module, at the cost of much longer XLA compiles (the cholesky is differentiated
inside the AIS scan). Use it where module transport size is the binding
constraint and compile time is not.

The pine-sapling dataset is not distributable here, so counts are drawn once from
the generative model at a fixed seed (f64 at init, documented, deterministic) — the
posterior geometry (1600-D, strong correlations, non-Gaussian likelihood) is what
the benchmark exercises.
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
        nugget: float = 1e-6,
        in_graph_kernel: bool = False,
        dtype=jnp.float32,
    ):
        self.in_graph_kernel = in_graph_kernel
        m = grid_size
        self.grid_size = m
        self.dim = m * m
        self.cell_area = 1.0 / (m * m)
        self.sigma2 = float(sigma2)
        self.inv_beta = float(inv_beta)
        self.nugget = float(nugget)
        self.mu = float(np.log(126.0) - sigma2 / 2.0)
        self.dtype = dtype

        # Grid coordinates: the ONLY kernel constant that enters traced code.
        idx = np.arange(m)
        xx, yy = np.meshgrid(idx, idx, indexing="ij")
        coords = np.stack([xx.ravel(), yy.ravel()], -1).astype(np.float64) / m
        self._coords = coords.astype(np.float32)

        # Init-time f64 reference kernel (data generation + tests only; NOT stored
        # as a device constant).
        dists = np.linalg.norm(coords[:, None, :] - coords[None, :, :], axis=-1)
        k = sigma2 * np.exp(-dists * inv_beta) + self.nugget * np.eye(self.dim)
        self.chol_np = np.linalg.cholesky(k)
        self._chol_const = None if in_graph_kernel else jnp.asarray(
            self.chol_np, dtype
        )

        # Deterministic synthetic counts from the generative model.
        rng = np.random.RandomState(data_seed)
        x_true = self.mu + self.chol_np @ rng.randn(self.dim)
        self.counts = jnp.asarray(
            rng.poisson(self.cell_area * np.exp(x_true)), dtype
        )
        self._x_true = jnp.asarray(x_true, dtype)

    # ---------------------------------------------------------------- kernel
    def _chol(self, dtype) -> Array:
        """In-graph chol(K) from the coords constant. x-independent, so XLA CSEs
        repeated uses within a program and hoists it out of scan loops."""
        c = jnp.asarray(self._coords, dtype)
        d = jnp.linalg.norm(c[:, None, :] - c[None, :, :], axis=-1)
        k = self.sigma2 * jnp.exp(-d * self.inv_beta) + self.nugget * jnp.eye(
            self.dim, dtype=dtype
        )
        return jnp.linalg.cholesky(k)

    def latent_to_field(self, e: Array) -> Array:
        """Whitened latent e -> log-intensity field x = mu + L e."""
        chol = self._chol(e.dtype) if self.in_graph_kernel else self._chol_const
        return self.mu + e @ chol.T.astype(e.dtype)

    # ---------------------------------------------------------------- density
    def log_prob(self, e: Array) -> Array:
        """Unnormalised posterior log-density over the whitened latent."""
        log_prior = -0.5 * jnp.sum(e**2, axis=-1) - 0.5 * self.dim * jnp.log(
            2 * jnp.pi
        )
        x = self.latent_to_field(e)
        # f32 overflow guard: exp(x) overflows past x ~ 88.7, which turns ONE
        # transiently-overshooting flow sample into log_prob = -inf and (via the
        # validity mask) can empty the whole batch. Past x = 80 we continue the
        # exp term LINEARLY: exp(80) * (1 + (x - 80)). A hard clamp would zero
        # d(exp-term)/dx there, leaving only the attractive +counts gradient
        # (pushing overshoots FURTHER out and degrading HMC leapfrogs); the
        # linear continuation keeps a huge restoring gradient (-cell_area *
        # exp(80) per unit x) while staying finite in f32 up to |x| ~ 1e3.
        # No effect in the posterior-typical region (x ~ mu +- a few).
        # The linear overshoot is itself capped at 1e3 so exp_term stays
        # <= 5.6e37 < f32 max for ANY x (an x beyond 1080 is a fully diverged
        # sample; it keeps the enormous finite penalty, just a zero gradient).
        exp_term = jnp.where(
            x > 80.0,
            jnp.exp(80.0) * (1.0 + jnp.minimum(x - 80.0, 1e3)),
            jnp.exp(jnp.minimum(x, 80.0)),
        )
        log_lik = jnp.sum(x * self.counts - self.cell_area * exp_term, axis=-1)
        return log_prior + log_lik

    def sample_prior(self, key: jax.Array, n: int) -> Array:
        """Prior over the whitened latent is exactly N(0, I)."""
        return jax.random.normal(key, (n, self.dim), self.dtype)

    # ---------------------------------------------------------------- metrics
    def performance_metrics(
        self,
        samples: Array,
        log_w: Array,
        log_q_fn: Optional[LogProbFn] = None,
        batch_size: Optional[int] = None,
        mask: Optional[Array] = None,
        key: Optional[jax.Array] = None,
    ) -> Dict[str, Array]:
        """Posterior-moment diagnostics in FIELD space: importance-weighted mean
        field vs the (known, synthetic) generating field."""
        if mask is None:
            mask = jnp.ones(log_w.shape, bool)
        w_bar = jax.nn.softmax(jnp.where(mask, log_w, -jnp.inf), axis=0)
        x = self.latent_to_field(samples)
        post_mean = jnp.sum(
            w_bar[:, None] * jnp.where(mask[:, None], x, 0.0), axis=0
        )
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
