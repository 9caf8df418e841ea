"""FABModel: flow + target + AIS + loss dispatch + evaluation.

Rework of fab/core.py:18-260. The model object is static configuration; all mutable
quantities (flow params, transition-operator adaptation state) live in an explicit
params pytree, and every method is a pure function suitable for jit/pjit. The
train-time vs eval-time AIS-target switch (min-var g = p^alpha q^(1-alpha) vs p,
fab/core.py:102-110) is a static argument compiled into separate programs rather than
mutable state.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fab_tpu import losses
from fab_tpu.flows.base import Flow, flow_log_prob
from fab_tpu.sampling.ais import AISResult, AnnealedImportanceSampler
from fab_tpu.targets.base import TargetDistribution
from fab_tpu.typing import Array
from fab_tpu.utils.numerical import effective_sample_size

Params = Any


@dataclasses.dataclass(frozen=True)
class FABModel:
    flow: Flow
    target: TargetDistribution
    ais: Optional[AnnealedImportanceSampler]
    loss_type: str
    alpha: float = 2.0
    # Optional pure fn (x, mask) -> mask applied to sampled batches before the
    # loss / buffer-add — the train-time chirality filter for ALDP (reference
    # experiments/aldp/train.py:228-243,318-326, fab_buff.yaml filter_chirality).
    sample_filter: Optional[Any] = None

    @classmethod
    def create(
        cls,
        flow: Flow,
        target: TargetDistribution,
        transition_operator=None,
        n_intermediate_distributions: int = 1,
        alpha: float = 2.0,
        ais_distribution_spacing: str = "linear",
        loss_type: str = "fab_alpha_div",
        use_ais: bool = True,
    ) -> "FABModel":
        """Wire flow + target + transition op into an AIS chain (fab/core.py:61-73)."""
        if loss_type not in losses.LOSS_TYPES:
            raise ValueError(
                f"Unknown loss_type {loss_type!r}; options: {losses.LOSS_TYPES}"
            )
        ais = None
        if use_ais or loss_type in ("fab_alpha_div", "fab_ub_alpha_2_div"):
            if transition_operator is None:
                raise ValueError("If using AIS, transition operator must be provided.")
            ais = AnnealedImportanceSampler(
                flow=flow,
                target_log_prob=target.log_prob,
                transition_operator=transition_operator,
                n_intermediate_distributions=n_intermediate_distributions,
                spacing_type=ais_distribution_spacing,
                alpha=alpha,
            )
        return cls(
            flow=flow, target=target, ais=ais, loss_type=loss_type, alpha=alpha
        )

    # ------------------------------------------------------------------ params

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        flow_params = self.flow.init(key, dtype)
        params = {"flow": flow_params}
        if self.ais is not None:
            params["transition"] = self.ais.transition_operator.init_state(
                self.flow.dim, dtype
            )
        return params

    def filter_batch(self, x: Array, mask: Array) -> Array:
        """Apply the optional sample filter (e.g. ALDP train-time chirality)."""
        if self.sample_filter is None:
            return mask
        return self.sample_filter(x, mask)

    # ------------------------------------------------------------------ losses

    def loss_and_info(
        self,
        params: Params,
        key: jax.Array,
        batch_size: int,
        tune: bool = True,
    ) -> Tuple[Array, Tuple[Params, Dict[str, Array]]]:
        """Scalar training loss + (updated params, iter info).

        Differentiate w.r.t. ``params`` with has_aux=True; only the flow params
        receive gradients (AIS output is stop-gradiented), the transition state is
        updated functionally (step-size adaptation, fab/core.py:78-128).
        """
        flow_params = params["flow"]
        info: Dict[str, Array] = {}
        new_params = dict(params)

        if self.loss_type == "fab_alpha_div":
            result = self.ais.sample_and_log_weights(
                flow_params,
                params["transition"],
                key,
                batch_size,
                p_target=False,
                tune=tune,
            )
            mask = self.filter_batch(result.point.x, result.mask)
            # Re-evaluate log q at the AIS points for the gradient; invalid rows
            # are zero-filled BEFORE the evaluation — masking only the loss value
            # would still let NaNs poison the backward pass (0 * NaN cotangents).
            x_safe = jnp.where(mask[:, None], result.point.x, 0.0)
            log_q_x = flow_log_prob(
                self.flow, flow_params, x_safe, jax.random.fold_in(key, 0x11A7)
            )
            loss = losses.fab_alpha_div(
                log_q_x, result.log_w, self.alpha, mask
            )
            new_params["transition"] = result.transition_state
            info.update(result.info)
        elif self.loss_type == "fab_ub_alpha_2_div":
            result = self.ais.sample_and_log_weights(
                flow_params,
                params["transition"],
                key,
                batch_size,
                p_target=False,
                tune=tune,
            )
            mask = self.filter_batch(result.point.x, result.mask)
            x_safe = jnp.where(mask[:, None], result.point.x, 0.0)
            log_q_x = flow_log_prob(
                self.flow, flow_params, x_safe, jax.random.fold_in(key, 0x11A7)
            )
            loss = losses.fab_ub_alpha_2_div(
                log_q_x, result.point.log_p, result.log_w, mask
            )
            new_params["transition"] = result.transition_state
            info.update(result.info)
        elif self.loss_type in (
            "flow_reverse_kl",
            "flow_alpha_2_div",
            "flow_alpha_2_div_unbiased",
            "flow_alpha_2_div_nis",
        ):
            x, log_q = self.flow.sample_and_log_prob(flow_params, key, batch_size)
            log_p = self.target.log_prob(x)
            loss_fn = getattr(losses, self.loss_type)
            if self.sample_filter is not None:
                # Train-time chirality filter on flow samples (reference
                # aldp/train.py:230-260): retained-row means only.
                mask = self.sample_filter(
                    x, jnp.isfinite(log_q) & jnp.isfinite(log_p)
                )
                loss = loss_fn(log_q, log_p, mask=mask)
            else:
                loss = loss_fn(log_q, log_p)
        elif self.loss_type == "target_forward_kl":
            x_p = self.target.sample(key, batch_size)
            loss = losses.forward_kl(
                flow_log_prob(
                    self.flow, flow_params, x_p, jax.random.fold_in(key, 0x11A7)
                )
            )
        else:
            raise NotImplementedError(self.loss_type)
        return loss, (new_params, info)

    def forward_kl_loss(
        self, params: Params, x_p: Array, key: jax.Array = None
    ) -> Array:
        """Forward KL given target samples (fab/core.py:181-183).

        ``key`` is only consumed by stochastic (SNF) flows, whose log_prob
        estimate needs fresh MH noise; deterministic flows ignore it.
        """
        return losses.forward_kl(
            flow_log_prob(self.flow, params["flow"], x_p, key)
        )

    # ------------------------------------------------------------------- eval

    def generate_eval_data(
        self,
        params: Params,
        key: jax.Array,
        outer_batch_size: int,
        inner_batch_size: int,
        p_target: bool = True,
    ):
        """Big eval batch via chunked AIS passes (fab/sampling_methods/ais.py:132-188).

        Python-level chunking of a jitted single-chunk program keeps device memory
        bounded; results are gathered to host numpy.
        """
        if outer_batch_size % inner_batch_size != 0:
            raise ValueError(
                f"eval outer_batch_size ({outer_batch_size}) must be a multiple of "
                f"inner_batch_size ({inner_batch_size}); pick e.g. "
                f"{-(-outer_batch_size // inner_batch_size) * inner_batch_size}"
            )
        n_batches = outer_batch_size // inner_batch_size

        # Single-chunk program also computing flow-sample IS weights at chain init
        # (ais.py:162): base_log_w = log_p(x0) - log_q(x0).
        @jax.jit
        def chunk_with_base(key):
            # Same key-split discipline as ais.sample_and_log_weights, so x0 here is
            # bitwise the same draw the AIS chain starts from (ais.py:154-162 uses one
            # draw for both) — XLA CSEs the duplicate flow sampling away.
            key_init, _ = jax.random.split(key)
            x0, log_q0 = self.flow.sample_and_log_prob(
                params["flow"], key_init, inner_batch_size
            )
            log_p0 = self.target.log_prob(x0)
            base_mask = (
                jnp.all(jnp.isfinite(x0), axis=-1)
                & jnp.isfinite(log_q0)
                & jnp.isfinite(log_p0)
            )
            base_log_w = jnp.where(base_mask, log_p0 - log_q0, -jnp.inf)
            result = self.ais.sample_and_log_weights(
                params["flow"],
                params["transition"],
                key,
                inner_batch_size,
                p_target=p_target,
                tune=False,
            )
            return x0, base_log_w, base_mask, result

        base_xs, base_lws, base_masks = [], [], []
        ais_xs, ais_lws, ais_masks = [], [], []
        for i in range(n_batches):
            x0, blw, bm, result = jax.device_get(
                chunk_with_base(jax.random.fold_in(key, i))
            )
            base_xs.append(x0)
            base_lws.append(blw)
            base_masks.append(bm)
            ais_xs.append(result.point.x)
            ais_lws.append(result.log_w)
            ais_masks.append(result.mask)
        cat = np.concatenate
        return (
            cat(base_xs),
            cat(base_lws),
            cat(base_masks),
            cat(ais_xs),
            cat(ais_lws),
            cat(ais_masks),
        )

    def get_eval_info(
        self,
        params: Params,
        key: jax.Array,
        outer_batch_size: int,
        inner_batch_size: int,
        p_target: bool = True,
        ais_only: bool = False,
    ) -> Dict[str, float]:
        """ESS + target metrics on flow and AIS samples (fab/core.py:191-220)."""
        key_data, key_metrics = jax.random.split(key)
        (
            base_x,
            base_log_w,
            base_mask,
            ais_x,
            ais_log_w,
            ais_mask,
        ) = self.generate_eval_data(
            params, key_data, outer_batch_size, inner_batch_size, p_target
        )
        info = {
            "eval_ess_flow": float(
                effective_sample_size(jnp.asarray(base_log_w), jnp.asarray(base_mask))
            ),
            "eval_ess_ais": float(
                effective_sample_size(jnp.asarray(ais_log_w), jnp.asarray(ais_mask))
            ),
        }
        flow_params = params["flow"]
        key_lq = jax.random.fold_in(key_metrics, 0x11A7)

        def log_q_fn(x):
            return flow_log_prob(self.flow, flow_params, x, key_lq)

        if not ais_only:
            flow_info = self.target.performance_metrics(
                jnp.asarray(base_x),
                jnp.asarray(base_log_w),
                log_q_fn,
                batch_size=inner_batch_size,
                mask=jnp.asarray(base_mask),
                key=key_metrics,
            )
            info.update(
                {"flow_" + k: float(v) for k, v in flow_info.items()}
            )
        ais_info = self.target.performance_metrics(
            jnp.asarray(ais_x),
            jnp.asarray(ais_log_w),
            mask=jnp.asarray(ais_mask),
            key=key_metrics,
        )
        info.update({"ais_" + k: float(v) for k, v in ais_info.items()})
        return info


def format_transition_info(
    t_info: Dict[str, Array], n_dists: int
) -> Dict[str, Array]:
    """Flatten stacked per-distribution transition info into reference-style keys.

    Mirrors the logging structure of hmc.py:59-88: acceptance probabilities and move
    distance for the first (and, if present, last) intermediate distribution.
    """
    out = {}
    p_acc = t_info["p_accept"]  # [n_dists, n_steps]
    for i in range(p_acc.shape[-1]):
        out[f"dist0_p_accept_{i}"] = p_acc[0, i]
    out["average_distance_dist0"] = t_info["avg_distance"][0]
    if n_dists > 1:
        for i in range(p_acc.shape[-1]):
            out[f"dist{n_dists - 1}_p_accept_{i}"] = p_acc[-1, i]
        out[f"average_distance_dist_{n_dists - 1}"] = t_info["avg_distance"][-1]
    return out
