"""FAB loss functions.

Rework of the loss zoo in fab/core.py:112-183 as pure functions. Each returns a scalar
loss (to be differentiated w.r.t. flow params) plus auxiliary info. Losses consuming
AIS output take the (stop-gradiented) points/log-weights and re-evaluate log q
differentiably — exactly the reference's gradient structure.

Masking: the reference drops NaN/Inf AIS rows before the loss; here invalid rows carry
log_w = -inf (zero softmax weight) and their log q is zeroed so no NaN can leak into
the loss graph.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fab_tpu.typing import Array

# Losses available for training; mirrors fab/core.py:45-49. The reference refuses to
# run its experimental losses (core.py:50-51); we keep them runnable but documented as
# experimental.
LOSS_TYPES = (
    "fab_alpha_div",
    "flow_reverse_kl",
    "forward_kl",
    "target_forward_kl",
    "flow_alpha_2_div_nis",
    "flow_alpha_2_div",  # experimental in reference
    "flow_alpha_2_div_unbiased",  # experimental in reference
    "fab_ub_alpha_2_div",  # experimental in reference
)


def fab_alpha_div(
    log_q_x: Array, log_w_ais: Array, alpha: float, mask: Optional[Array] = None
) -> Array:
    """FAB alpha-divergence loss: -sign(alpha) * mean(softmax(log_w_ais) * log q).

    Matches fab/core.py:112-118; AIS must have targeted p^alpha q^(1-alpha). ``mask``
    excludes invalid rows both from the softmax and from the mean's denominator (the
    reference shrinks the batch by dropping them).
    """
    if mask is not None:
        log_w_ais = jnp.where(mask, log_w_ais, -jnp.inf)
        log_q_x = jnp.where(mask, log_q_x, 0.0)
        n = jnp.maximum(jnp.sum(mask), 1)
    else:
        n = log_q_x.shape[0]
    w_bar = jax.nn.softmax(jax.lax.stop_gradient(log_w_ais), axis=0)
    return -np.sign(alpha) * jnp.sum(w_bar * log_q_x) / n


def buffer_replay_loss(
    log_q_x: Array,
    log_q_old: Array,
    alpha: float,
    w_adjust_max_clip: Optional[float],
    mask: Optional[Array] = None,
):
    """Prioritised-buffer replay loss with importance-weight adjustment.

    Matches fab/train_with_prioritised_buffer.py:162-171:
    w_adjust = clip(exp((1-alpha)(sg(log q_new) - log q_old)), max), and
    loss = -mean(w_adjust * log q_new). Returns (loss, log_w_adjust, w_adjust_pre_clip)
    — the adjustment feeds back into the buffer priorities.
    """
    log_w_adjust = (1 - alpha) * (jax.lax.stop_gradient(log_q_x) - log_q_old)
    w_adjust_pre_clip = jnp.exp(log_w_adjust)
    if w_adjust_max_clip is not None:
        w_adjust = jnp.clip(w_adjust_pre_clip, max=w_adjust_max_clip)
    else:
        w_adjust = w_adjust_pre_clip
    if mask is not None:
        w_adjust = jnp.where(mask, w_adjust, 0.0)
        log_q_safe = jnp.where(mask, log_q_x, 0.0)
        n = jnp.maximum(jnp.sum(mask), 1)
        loss = -jnp.sum(w_adjust * log_q_safe) / n
    else:
        loss = -jnp.mean(w_adjust * log_q_x)
    return loss, log_w_adjust, w_adjust_pre_clip


def _masked_mean(v: Array, mask: Optional[Array]) -> Array:
    """Mean over retained rows (the reference drops rows; we mask)."""
    if mask is None:
        return jnp.mean(v)
    n = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, v, 0.0)) / n


def flow_reverse_kl(
    log_q: Array, log_p: Array, mask: Optional[Array] = None
) -> Array:
    """Reverse KL on flow samples (fab/core.py:130-133); ``mask`` restricts the
    means to retained rows (train-time chirality filter, aldp/train.py:244-250)."""
    return _masked_mean(log_q, mask) - _masked_mean(log_p, mask)


def flow_alpha_2_div(
    log_q: Array, log_p: Array, mask: Optional[Array] = None
) -> Array:
    """logsumexp form of the alpha-2 divergence (fab/core.py:135-138; experimental)."""
    lw = 2 * (log_p - log_q)
    if mask is not None:
        lw = jnp.where(mask, lw, -jnp.inf)
    return jax.scipy.special.logsumexp(lw, axis=0)


def flow_alpha_2_div_unbiased(
    log_q: Array, log_p: Array, mask: Optional[Array] = None
) -> Array:
    """Unbiased alpha-2 estimate from flow samples (fab/core.py:140-145;
    experimental)."""
    return _masked_mean(jnp.exp(2 * (log_p - log_q)) * log_q, mask)


def flow_alpha_2_div_nis(
    log_q: Array, log_p: Array, mask: Optional[Array] = None
) -> Array:
    """Neural-IS loss (arXiv:1808.03856), fab/core.py:147-152."""
    w_sq = jax.lax.stop_gradient(jnp.exp(2 * (log_p - log_q)))
    return -_masked_mean(w_sq * log_q, mask)


def forward_kl(log_q_xp: Array) -> Array:
    """Forward KL up to a constant, with x ~ p (fab/core.py:181-183)."""
    return -jnp.mean(log_q_xp)


def fab_ub_alpha_2_div(
    log_q_x: Array, log_p: Array, log_w_ais: Array, mask: Optional[Array] = None
) -> Array:
    """Upper-bound alpha-2 FAB loss (arXiv:2111.11510), fab/core.py:163-168
    (experimental; the reference's non-inner path at core.py:172-173 is broken —
    it passes log-probs where a Point is expected — this is the corrected form)."""
    log_w = log_p - log_q_x
    if mask is not None:
        log_w_ais = jnp.where(mask, log_w_ais, -jnp.inf)
        log_w = jnp.where(mask, log_w, 0.0)
    return jax.scipy.special.logsumexp(log_w_ais + log_w, axis=0)
