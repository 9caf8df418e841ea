"""Simple Gaussian test target (fab/target_distributions/gaussian.py:12-94)."""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from fab_tpu.targets.base import LogProbFn, TargetDistribution
from fab_tpu.utils.numerical import (
    effective_sample_size_over_p,
    importance_weighted_expectation,
    quadratic_function,
)

Array = jnp.ndarray


class Gaussian(TargetDistribution):
    def __init__(self, loc: Array, scale: Array, n_test_set_samples: int = 1000):
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)
        self.dim = self.loc.shape[-1]
        self.n_test_set_samples = n_test_set_samples

    def log_prob(self, x: Array) -> Array:
        eps = (x - self.loc) / self.scale
        return (
            -0.5 * jnp.sum(eps**2, axis=-1)
            - jnp.sum(jnp.log(self.scale))
            - 0.5 * self.dim * jnp.log(2 * jnp.pi)
        )

    def sample(self, key: jax.Array, n: int) -> Array:
        eps = jax.random.normal(key, (n, self.dim), self.loc.dtype)
        return self.loc + eps * self.scale

    def performance_metrics(
        self,
        samples: Array,
        log_w: Array,
        log_q_fn: Optional[LogProbFn] = None,
        batch_size: Optional[int] = None,
        mask: Optional[Array] = None,
        key: Optional[jax.Array] = None,
    ) -> Dict[str, Array]:
        del batch_size
        expectation = importance_weighted_expectation(
            quadratic_function, samples, log_w, mask
        )
        info = {"quadratic_expectation": expectation}
        if log_q_fn is not None and key is not None:
            test_x = self.sample(key, self.n_test_set_samples)
            log_q_test = log_q_fn(test_x)
            log_p_test = self.log_prob(test_x)
            info.update(
                test_set_mean_log_prob=jnp.mean(log_q_test),
                kl_forward=jnp.mean(log_p_test - log_q_test),
                ess_over_p=effective_sample_size_over_p(log_p_test - log_q_test),
            )
        return info
