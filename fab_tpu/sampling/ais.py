"""Annealed importance sampling as a single compiled scan.

Rework of fab/sampling_methods/ais.py:20-213. The reference's Python loop over
intermediate distributions (ais.py:74-75) becomes ``lax.scan`` over the static beta
schedule; transition-operator adaptation state is carried functionally; NaN/Inf rows
are never dropped (which would make shapes dynamic, ais.py:190-213) — instead a
validity ``mask`` is threaded through and invalid rows are excluded from every
reduction and given weight -inf.

Train-time AIS targets the minimum-variance IS distribution g = p^alpha q^(1-alpha);
eval-time targets p. That switch is the static ``p_target`` argument (compiled as two
programs), never mutable state — see fab/core.py:102-110 and SURVEY §7.3.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fab_tpu.flows.base import Flow, flow_log_prob
from fab_tpu.sampling.point import create_point, intermediate_log_prob
from fab_tpu.sampling.schedules import beta_schedule
from fab_tpu.typing import Array, LogProbFn, Point
from fab_tpu.utils.numerical import effective_sample_size, log_z_estimate


class AISResult(NamedTuple):
    point: Point
    log_w: Array  # [B]
    mask: Array  # [B] bool — valid rows
    transition_state: Any
    info: Dict[str, Array]


@dataclasses.dataclass(frozen=True)
class AnnealedImportanceSampler:
    """Static AIS config: flow + target + transition operator + beta schedule."""

    flow: Flow
    target_log_prob: LogProbFn
    transition_operator: Any  # HamiltonianMonteCarlo | Metropolis
    n_intermediate_distributions: int = 1
    spacing_type: str = "linear"
    alpha: float = 2.0

    @property
    def betas(self) -> np.ndarray:
        return beta_schedule(self.spacing_type, self.n_intermediate_distributions)

    def sample_and_log_weights(
        self,
        flow_params,
        transition_state,
        key: jax.Array,
        batch_size: int,
        p_target: bool = False,
        tune: bool = True,
    ) -> AISResult:
        """Run one AIS pass: flow sample -> anneal through the beta schedule.

        Matches ais.py:53-105. All outputs are stop-gradiented; the FAB loss
        re-evaluates log q on the returned points.
        """
        flow_params = jax.lax.stop_gradient(flow_params)
        ais_alpha = 1.0 if p_target else self.alpha
        betas = jnp.asarray(self.betas)
        trans_op = self.transition_operator

        # Per-pass key for stochastic-flow (SNF) log_prob: fresh every AIS pass,
        # held fixed *within* the pass so the chain anneals against one coherent
        # log q estimate. fold_in (rather than re-splitting key) leaves the
        # key_init/key_chain stream bitwise-unchanged for deterministic flows.
        key_lq = jax.random.fold_in(key, 0x10C9)

        def log_q_fn(x):
            return flow_log_prob(self.flow, flow_params, x, key_lq)

        key_init, key_chain = jax.random.split(key)
        x, log_q_flow = self.flow.sample_and_log_prob(
            flow_params, key_init, batch_size
        )
        # Validity mask replaces the reference's row dropping (ais.py:190-213):
        # invalid rows are zero-filled so they traverse the chain harmlessly and are
        # excluded from all estimates.
        row_ok = jnp.all(jnp.isfinite(x), axis=-1) & jnp.isfinite(log_q_flow)
        x = jnp.where(row_ok[:, None], x, 0.0)
        point = create_point(
            x,
            log_q_fn,
            self.target_log_prob,
            with_grad=trans_op.uses_grad_info,
            log_q_x=jnp.where(row_ok, log_q_flow, 0.0),
        )
        if trans_op.uses_grad_info:
            # create_point recomputed log_q at the sanitised x; still guard it.
            row_ok = row_ok & jnp.isfinite(point.log_q)
        mask = row_ok & jnp.isfinite(point.log_p)

        log_w = intermediate_log_prob(point, betas[1], ais_alpha) - point.log_q
        ess_base = effective_sample_size(point.log_p - point.log_q, mask)

        def chain_step(carry, inputs):
            point, log_w, trans_state = carry
            dist_idx, key = inputs
            beta_j = betas[dist_idx + 1]
            beta_jp1 = betas[dist_idx + 2]
            point, trans_state, t_info = trans_op.transition(
                trans_state,
                key,
                point,
                beta_j,
                dist_idx,
                log_q_fn,
                self.target_log_prob,
                ais_alpha,
                mask,
                tune,
            )
            # Weight increment log pi_{j+1}(x) - log pi_j(x) (ais.py:90-105).
            log_w = log_w + (
                intermediate_log_prob(point, beta_jp1, ais_alpha)
                - intermediate_log_prob(point, beta_j, ais_alpha)
            )
            return (point, log_w, trans_state), t_info

        n_dists = self.n_intermediate_distributions
        (point, log_w, transition_state), t_infos = jax.lax.scan(
            chain_step,
            (point, log_w, transition_state),
            (jnp.arange(n_dists), jax.random.split(key_chain, n_dists)),
        )

        # Chain-end validity (ais.py:77): extreme points can go non-finite under the
        # target or flow during the chain. Finite-but-astronomical rows are equally
        # numerically broken (a target/flow overflow guard can return e.g. -1e34,
        # making log_w ~ +1e68 via -log_q and turning the loss logsumexp inf even
        # though every row is "finite" — observed on LGCP-1600); |log_w| beyond
        # 1e10 nats cannot arise from a healthy chain, so treat it as invalid.
        finite_ok = (
            mask
            & jnp.isfinite(point.log_q)
            & jnp.isfinite(point.log_p)
            & jnp.isfinite(log_w)
        )
        # Surfaced separately in info as n_logw_bound_masked so a target that
        # trips the bound is visible in training logs, not silently masked.
        bound_ok = jnp.abs(log_w) < 1e10
        mask = finite_ok & bound_ok
        log_w = jnp.where(mask, log_w, -jnp.inf)

        info = {
            "ess_base": ess_base,
            "ess_ais": effective_sample_size(log_w, mask),
            "log_Z": log_z_estimate(log_w, mask),
            "n_valid": jnp.sum(mask),
            "n_logw_bound_masked": jnp.sum(finite_ok & ~bound_ok),
            # Stacked per-intermediate-distribution transition info:
            # p_accept [n_dists, n_steps], avg_distance [n_dists].
            "transition": t_infos,
        }
        return AISResult(point, log_w, mask, transition_state, info)
