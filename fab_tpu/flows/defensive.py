"""Defensive mixture distribution: flow mixed with a learned diagonal Gaussian.

Rework of fab/trainable_distributions/defensive_mixture.py:9-71 (experimental in the
reference, not used in main paper runs): q(x) = w * q_flow(x) + (1-w) * N(x; mu,
sigma), with logsumexp log-prob and non-reparameterised (component-sampled) draws. The
defensive component guards importance weights against flow tail collapse.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from fab_tpu.flows.base import DiagGaussianBase, Flow

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class DefensiveMixture:
    """Static config wrapping a Flow; params add the defensive Gaussian + logit."""

    flow: Flow

    @property
    def dim(self) -> int:
        return self.flow.dim

    @property
    def event_shape(self) -> Tuple[int, ...]:
        return (self.flow.dim,)

    def init(self, key: jax.Array, dtype=jnp.float32):
        return {
            "flow": self.flow.init(key, dtype),
            "defensive": DiagGaussianBase(self.dim).init(dtype),
            # Mixture weight logit: sigmoid(logit) = flow weight; init 0.9-ish.
            "mixture_logit": jnp.asarray(2.2, dtype),
        }

    def _log_weights(self, params) -> Tuple[Array, Array]:
        log_w_flow = jax.nn.log_sigmoid(params["mixture_logit"])
        log_w_def = jax.nn.log_sigmoid(-params["mixture_logit"])
        return log_w_flow, log_w_def

    def log_prob(self, params, x: Array) -> Array:
        log_w_flow, log_w_def = self._log_weights(params)
        log_q_flow = self.flow.log_prob(params["flow"], x)
        log_q_def = DiagGaussianBase(self.dim).log_prob(params["defensive"], x)
        return jnp.logaddexp(log_w_flow + log_q_flow, log_w_def + log_q_def)

    def sample_and_log_prob(
        self, params, key: jax.Array, n: int
    ) -> Tuple[Array, Array]:
        """Component-sampled draws; NOT reparameterised through the mixture choice
        (defensive_mixture.py:44-63) — use log_prob-based losses."""
        key_choice, key_flow, key_def = jax.random.split(key, 3)
        log_w_flow, _ = self._log_weights(params)
        use_flow = jax.random.bernoulli(
            key_choice, jnp.exp(log_w_flow), (n,)
        )
        x_flow, _ = self.flow.sample_and_log_prob(params["flow"], key_flow, n)
        x_def, _ = DiagGaussianBase(self.dim).sample_and_log_prob(
            params["defensive"], key_def, n
        )
        x = jnp.where(use_flow[:, None], x_flow, x_def)
        x = jax.lax.stop_gradient(x)
        return x, self.log_prob(params, x)

    def sample(self, params, key: jax.Array, n: int) -> Array:
        return self.sample_and_log_prob(params, key, n)[0]
