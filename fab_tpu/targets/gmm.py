"""Gaussian-mixture target (the GMM-40 workload).

TPU-native rework of fab/target_distributions/gmm.py:12-99. The component means are
the exact fixed-seed draws of the reference (via utils/seeding.py) so metrics are
directly comparable; covariances are diagonal with scale softplus(log_var_scaling)
(gmm.py:23-27). Very low log-probs are masked to -inf (gmm.py:57-66) to keep absurd
points out of the loss and buffer.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fab_tpu.targets.base import LogProbFn, TargetDistribution
from fab_tpu.utils.numerical import (
    effective_sample_size_over_p,
    importance_weighted_expectation,
    mc_estimate_true_expectation,
    quadratic_function,
)
from fab_tpu.utils.seeding import gmm_mean_draws

Array = jnp.ndarray


class GMM(TargetDistribution):
    def __init__(
        self,
        dim: int = 2,
        n_mixes: int = 40,
        loc_scaling: float = 40.0,
        log_var_scaling: float = 1.0,
        seed: int = 0,
        n_test_set_samples: int = 1000,
        true_expectation_estimation_n_samples: int = int(1e7),
        expectation_key: Optional[jax.Array] = None,
        dtype=jnp.float32,
    ):
        self.dim = dim
        self.n_mixes = n_mixes
        self.seed = seed
        self.n_test_set_samples = n_test_set_samples
        self.locs = jnp.asarray(
            gmm_mean_draws(n_mixes, dim, seed) * loc_scaling, dtype
        )
        # scale_tril = diag(softplus(log_var)), matching gmm.py:23-27.
        scale = np.log1p(np.exp(log_var_scaling)) * np.ones((n_mixes, dim))
        self.scales = jnp.asarray(scale, dtype)
        if expectation_key is None:
            expectation_key = jax.random.key(0)
        self.true_expectation = mc_estimate_true_expectation(
            self.sample,
            quadratic_function,
            true_expectation_estimation_n_samples,
            expectation_key,
        )

    def save_as_numpy(self, path: str) -> None:
        """Export mixture parameters for cross-framework comparison (the
        reference's CRAFT-parity export, gmm.py:102-114)."""
        np.savez(
            path,
            locs=np.asarray(self.locs),
            scales=np.asarray(self.scales),
            weights=np.full((self.n_mixes,), 1.0 / self.n_mixes),
        )

    def log_prob(self, x: Array) -> Array:
        diff = x[..., None, :] - self.locs  # [..., K, D]
        log_comp = -0.5 * jnp.sum((diff / self.scales) ** 2, axis=-1) - jnp.sum(
            jnp.log(self.scales), axis=-1
        ) - 0.5 * self.dim * jnp.log(2 * jnp.pi)
        log_prob = jax.scipy.special.logsumexp(log_comp, axis=-1) - jnp.log(
            self.n_mixes
        )
        # Mask absurdly low log-probs to -inf (gmm.py:57-66).
        return jnp.where(log_prob < -1e4, -jnp.inf, log_prob)

    def sample(self, key: jax.Array, n: int) -> Array:
        key_comp, key_eps = jax.random.split(key)
        comps = jax.random.randint(key_comp, (n,), 0, self.n_mixes)
        eps = jax.random.normal(key_eps, (n, self.dim), self.locs.dtype)
        return self.locs[comps] + eps * self.scales[comps]

    def test_set(self, key: jax.Array) -> Array:
        return self.sample(key, self.n_test_set_samples)

    def evaluate_expectation(self, samples, log_w, mask=None):
        expectation = importance_weighted_expectation(
            quadratic_function, samples, log_w, mask
        )
        return (expectation - self.true_expectation) / self.true_expectation

    def performance_metrics(
        self,
        samples: Array,
        log_w: Array,
        log_q_fn: Optional[LogProbFn] = None,
        batch_size: Optional[int] = None,
        mask: Optional[Array] = None,
        key: Optional[jax.Array] = None,
    ) -> Dict[str, Array]:
        """Expectation bias + test-set metrics, matching gmm.py:78-99."""
        del batch_size
        bias_normed = self.evaluate_expectation(samples, log_w, mask)
        bias_no_correction = self.evaluate_expectation(
            samples, jnp.zeros_like(log_w), mask
        )
        info = {
            "bias_normed": jnp.abs(bias_normed),
            "bias_no_correction": jnp.abs(bias_no_correction),
        }
        if log_q_fn is not None:
            if key is None:
                key = jax.random.key(self.seed)
            test_x = self.test_set(key)
            log_q_test = log_q_fn(test_x)
            log_p_test = self.log_prob(test_x)
            # Finite-masked means (deviation from gmm.py:78-99, which would NaN the
            # whole metric): a single tail test draw can overflow the flow inverse;
            # such rows are excluded and COUNTED instead of poisoning the mean —
            # the repo-wide mask-don't-crash policy (SURVEY §5).
            ok = jnp.isfinite(log_q_test) & jnp.isfinite(log_p_test)
            n_ok = jnp.sum(ok)
            mean_ok = lambda v: jnp.where(
                n_ok == 0,  # all rows invalid: report NaN, not a fake 0.0
                jnp.nan,
                jnp.sum(jnp.where(ok, v, 0.0)) / jnp.maximum(n_ok, 1),
            )
            info.update(
                test_set_mean_log_prob=mean_ok(log_q_test),
                kl_forward=mean_ok(log_p_test - log_q_test),
                ess_over_p=jnp.where(
                    n_ok == 0,
                    jnp.nan,  # 1/mean(exp(-inf)) would report +inf ("perfect")
                    effective_sample_size_over_p(
                        jnp.where(ok, log_p_test - log_q_test, -jnp.inf)
                    ),
                ),
                test_set_n_nonfinite=jnp.sum(~ok),
            )
        return info
