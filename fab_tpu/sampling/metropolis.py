"""Random-walk Metropolis transition kernel.

Rework of fab/sampling_methods/transition_operators/metropolis.py:9-74 as a pure
function: the per-(distribution, inner-step) proposal scales live in an explicit state
pytree carried through the AIS scan, and the x1.05 / /1.05 step-size tuning toward
``target_p_accept`` consumes the *global* (mask-aware, batch-mean) acceptance rate so
every device updates the state identically under pjit.

Note: the reference's ``set_eval_mode`` inverts its flag (metropolis.py:41, a bug we do
not replicate); here tuning is simply disabled when ``tune=False`` (eval).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from fab_tpu.sampling.point import create_point, intermediate_log_prob
from fab_tpu.typing import Array, LogProbFn, Point, select_point


def masked_mean(vals: Array, mask: Array) -> Array:
    return jnp.sum(jnp.where(mask, vals, 0.0)) / jnp.maximum(jnp.sum(mask), 1)


@dataclasses.dataclass(frozen=True)
class Metropolis:
    """Static config; state = {"noise_scalings": [n_dists, n_updates]}."""

    n_ais_intermediate_distributions: int
    n_updates: int = 1
    max_step_size: float = 1.0
    min_step_size: float = 0.1
    adjust_step_size: bool = True
    target_p_accept: float = 0.65

    uses_grad_info: bool = dataclasses.field(default=False, init=False, repr=False)

    def init_state(self, dim: int, dtype=jnp.float32):
        del dim
        row = jnp.linspace(self.max_step_size, self.min_step_size, self.n_updates)
        return {
            "noise_scalings": jnp.tile(
                row[None, :], (self.n_ais_intermediate_distributions, 1)
            ).astype(dtype)
        }

    def init_info(self) -> Dict[str, Array]:
        return {
            "p_accept": jnp.zeros((self.n_updates,)),
            "avg_distance": jnp.zeros(()),
        }

    def transition(
        self,
        state,
        key: jax.Array,
        point: Point,
        beta: Array,
        dist_idx: Array,
        log_q_fn: LogProbFn,
        log_p_fn: LogProbFn,
        ais_alpha: float,
        mask: Array,
        tune: bool,
    ) -> Tuple[Point, dict, Dict[str, Array]]:
        """n_updates Gaussian random-walk MH steps targeting pi_beta."""
        x_original = point.x
        scalings = state["noise_scalings"]

        def body(carry, inputs):
            point, log_prob_curr, scal_row = carry
            n, key_n = inputs
            key_prop, key_acc = jax.random.split(key_n)
            sigma = scal_row[n]
            x_prop = point.x + sigma * jax.random.normal(
                key_prop, point.x.shape, point.x.dtype
            )
            point_prop = create_point(x_prop, log_q_fn, log_p_fn, with_grad=False)
            log_prob_prop = intermediate_log_prob(point_prop, beta, ais_alpha)
            # Acceptance probability, NaN-rejected (metropolis.py:60-64).
            accept_prob = jnp.exp(log_prob_prop - log_prob_curr)
            accept_prob = jnp.nan_to_num(accept_prob, nan=0.0, posinf=0.0, neginf=0.0)
            accept = accept_prob > jax.random.uniform(
                key_acc, accept_prob.shape, accept_prob.dtype
            )
            point = select_point(accept, point_prop, point)
            log_prob_curr = jnp.where(accept, log_prob_prop, log_prob_curr)
            # Global batch-mean acceptance for tuning (metropolis.py:68-73).
            p_accept = masked_mean(jnp.clip(accept_prob, max=1.0), mask)
            if tune and self.adjust_step_size:
                factor = jnp.where(p_accept > self.target_p_accept, 1.05, 1 / 1.05)
                scal_row = scal_row.at[n].multiply(factor)
            return (point, log_prob_curr, scal_row), p_accept

        log_prob_curr = intermediate_log_prob(point, beta, ais_alpha)
        scal_row = scalings[dist_idx]
        keys = jax.random.split(key, self.n_updates)
        (point, _, scal_row), p_accepts = jax.lax.scan(
            body,
            (point, log_prob_curr, scal_row),
            (jnp.arange(self.n_updates), keys),
        )
        state = {"noise_scalings": scalings.at[dist_idx].set(scal_row)}
        distance = jnp.linalg.norm(point.x - x_original, axis=-1)
        info = {
            "p_accept": p_accepts,
            "avg_distance": masked_mean(distance, mask),
        }
        return point, state, info
