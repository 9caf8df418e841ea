"""Hamiltonian Monte Carlo transition kernel.

Rework of fab/sampling_methods/transition_operators/hmc.py:8-202 as a pure function.
Step sizes are per-(intermediate-distribution, outer-step) plus a weakly-shared common
component (hmc.py:36-38, get_epsilon at :90-100), carried in an explicit state pytree
through the AIS scan and adapted toward ``target_p_accept`` with the x1.05 / x1.02
multiplicative rule (hmc.py:162-170) driven by the *global* batch-mean acceptance
probability, so all devices update the state identically under pjit.

Leapfrog is a ``lax.scan`` over L steps; each step re-evaluates the flow and target
log-probs *with gradients* (create_point) — the hottest loop of FAB training (SURVEY
§3.1). Gradients are clamped to +-max_grad and NaN-scrubbed (hmc.py:194-199); the MH
test rejects non-finite acceptance ratios (hmc.py:105-124).

Deviation from the reference (documented per SURVEY §7.3): with n_outer > 1 the
reference starts each outer trajectory from the previous *proposal* even when it was
rejected (hmc.py:131-136 reuse `point` rather than `current_point`); we start from the
current accepted state, which is the correct MH chain. Identical for n_outer = 1 (all
paper configs).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from fab_tpu.sampling.metropolis import masked_mean
from fab_tpu.sampling.point import create_point, grad_intermediate_log_prob, intermediate_log_prob
from fab_tpu.typing import Array, LogProbFn, Point, select_point


@dataclasses.dataclass(frozen=True)
class HamiltonianMonteCarlo:
    """Static config; state = {"epsilons", "common_epsilon", "mass"}."""

    n_ais_intermediate_distributions: int
    n_outer: int = 1
    n_leapfrog: int = 5  # L
    epsilon: float = 1.0
    target_p_accept: float = 0.65
    max_grad: float = 1e3
    common_epsilon_init_weight: float = 0.1
    mass_init: float = 1.0

    uses_grad_info: bool = dataclasses.field(default=True, init=False, repr=False)

    def init_state(self, dim: int, dtype=jnp.float32):
        return {
            "epsilons": jnp.full(
                (self.n_ais_intermediate_distributions, self.n_outer),
                self.epsilon * (1 - self.common_epsilon_init_weight),
                dtype,
            ),
            "common_epsilon": jnp.asarray(
                self.epsilon * self.common_epsilon_init_weight, dtype
            ),
            "mass": jnp.full((dim,), self.mass_init, dtype),
        }

    def init_info(self) -> Dict[str, Array]:
        return {
            "p_accept": jnp.zeros((self.n_outer,)),
            "avg_distance": jnp.zeros(()),
        }

    def _kinetic_energy(self, p: Array, mass: Array) -> Array:
        return jnp.sum(p**2 / mass, axis=-1) / 2

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
        mass = state["mass"]
        epsilons = state["epsilons"]
        common_epsilon = state["common_epsilon"]
        x_original = point.x

        def u_value(pt: Point) -> Array:
            return -intermediate_log_prob(pt, beta, ais_alpha)

        def grad_u(pt: Point) -> Array:
            g = -grad_intermediate_log_prob(pt, beta, ais_alpha)
            g = jnp.clip(g, min=-self.max_grad, max=self.max_grad)
            return jnp.nan_to_num(g, nan=0.0, posinf=0.0, neginf=0.0)

        def new_point(x: Array) -> Point:
            return create_point(x, log_q_fn, log_p_fn, with_grad=True)

        def outer_body(carry, inputs):
            point, eps_row, common_eps = carry
            n, key_n = inputs
            key_mom, key_acc = jax.random.split(key_n)
            epsilon = eps_row[n] + common_eps
            # Momentum refresh (hmc.py:134): p ~ N(0, mass^2) with KE = p^2/(2 mass);
            # standard HMC for mass = 1 (reference quirk kept for parity).
            p0 = jax.random.normal(key_mom, point.x.shape, point.x.dtype) * mass
            proposal = point
            p = p0
            grad = grad_u(proposal)

            def leapfrog(carry, _):
                proposal, p, grad = carry
                p = p - epsilon * grad / 2
                x = proposal.x + epsilon / mass * p
                proposal = new_point(x)
                grad = grad_u(proposal)
                p = p - epsilon * grad / 2
                return (proposal, p, grad), None

            (proposal, p, _), _ = jax.lax.scan(
                leapfrog, (proposal, p, grad), None, length=self.n_leapfrog
            )
            # MH accept on the joint (hmc.py:102-124), exponential-race form.
            log_acc = (
                -u_value(proposal)
                - self._kinetic_energy(p, mass)
                + u_value(point)
                + self._kinetic_energy(p0, mass)
            )
            finite = jnp.isfinite(log_acc)
            log_acc = jnp.where(finite, log_acc, -jnp.inf)
            accept = log_acc > -jax.random.exponential(
                key_acc, log_acc.shape, log_acc.dtype
            )
            accept = accept & finite
            point = select_point(accept, proposal, point)
            # Global masked-mean acceptance probability for adaptation/logging:
            # mean(exp(min(log_acc, 0))) over valid rows (hmc.py:121-123).
            p_accept = masked_mean(jnp.exp(jnp.clip(log_acc, max=0.0)), mask)
            if tune:
                too_high = p_accept > self.target_p_accept
                eps_row = eps_row.at[n].multiply(jnp.where(too_high, 1.05, 1 / 1.05))
                common_eps = common_eps * jnp.where(too_high, 1.02, 1 / 1.02)
            return (point, eps_row, common_eps), p_accept

        eps_row = epsilons[dist_idx]
        keys = jax.random.split(key, self.n_outer)
        (point, eps_row, common_epsilon), p_accepts = jax.lax.scan(
            outer_body,
            (point, eps_row, common_epsilon),
            (jnp.arange(self.n_outer), keys),
        )
        state = {
            "epsilons": epsilons.at[dist_idx].set(eps_row),
            "common_epsilon": common_epsilon,
            "mass": mass,
        }
        distance = jnp.linalg.norm(point.x - x_original, axis=-1)
        info = {
            "p_accept": p_accepts,
            "avg_distance": masked_mean(distance, mask),
        }
        return point, state, info
