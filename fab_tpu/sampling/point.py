"""Point construction and annealed intermediate densities.

Rework of fab/sampling_methods/base.py:50-124. Gradients of log q / log p w.r.t. x are
computed with one ``jax.vjp`` each (one forward + one backward, batched over particles)
instead of the reference's per-tensor autograd calls; everything is stop-gradiented —
the AIS chain is never backpropagated through (the FAB loss re-evaluates log q on the
resulting points).

The intermediate density is the general-alpha form
``log pi_beta = ((1-beta) + beta(1-alpha)) log q + beta * alpha * log p``
(base.py:87-97). Setting alpha=1 recovers the plain AIS target g = p, which is how the
train-time (min-var target, alpha=2) vs eval-time (p target) switch is encoded — as a
parameter of the compiled program, not mutable state (see SURVEY §7.3). NOTE: the
reference hard-codes alpha=2 in the *gradient* of the intermediate density
(base.py:116) while the value uses general alpha (base.py:94); we use the consistent
general-alpha coefficients in both.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fab_tpu.typing import Array, LogProbFn, Point


def batched_value_and_grad(f: LogProbFn, x: Array) -> Tuple[Array, Array]:
    """Per-sample value and gradient of a batched scalar-per-row function."""
    vals, vjp_fn = jax.vjp(f, x)
    (grads,) = vjp_fn(jnp.ones_like(vals))
    return vals, grads


def create_point(
    x: Array,
    log_q_fn: LogProbFn,
    log_p_fn: LogProbFn,
    with_grad: bool,
    log_q_x: Optional[Array] = None,
) -> Point:
    """Build a Point with cached log-probs (and score terms if ``with_grad``).

    Mirrors fab/sampling_methods/base.py:59-72; all outputs are stop-gradiented.
    """
    x = jax.lax.stop_gradient(x)
    if with_grad:
        log_q, grad_log_q = batched_value_and_grad(log_q_fn, x)
        log_p, grad_log_p = batched_value_and_grad(log_p_fn, x)
        point = Point(x, log_q, log_p, grad_log_q, grad_log_p)
    else:
        log_q = log_q_x if log_q_x is not None else log_q_fn(x)
        point = Point(x, log_q, log_p_fn(x))
    return jax.lax.stop_gradient(point)


def intermediate_coefficients(beta: Array, ais_alpha: float) -> Tuple[Array, Array]:
    """(coef_log_q, coef_log_p) of the annealed density at inverse temperature beta."""
    return (1.0 - beta) + beta * (1.0 - ais_alpha), beta * ais_alpha


def intermediate_log_prob(point: Point, beta: Array, ais_alpha: float) -> Array:
    """log pi_beta(x); general-alpha form of base.py:76-97 (alpha=1 => target p)."""
    c_q, c_p = intermediate_coefficients(beta, ais_alpha)
    return c_q * point.log_q + c_p * point.log_p


def grad_intermediate_log_prob(point: Point, beta: Array, ais_alpha: float) -> Array:
    """grad_x log pi_beta(x) from cached scores (consistent-alpha form; see module
    docstring re the reference's hard-coded alpha=2 at base.py:116)."""
    assert point.grad_log_q is not None and point.grad_log_p is not None
    c_q, c_p = intermediate_coefficients(beta, ais_alpha)
    return c_q * point.grad_log_q + c_p * point.grad_log_p


def resample(key: jax.Array, point: Point, log_w: Array) -> Point:
    """Multinomial resampling by log-weight (base.py:121-124)."""
    indices = jax.random.categorical(key, log_w, shape=(log_w.shape[0],))
    return jax.tree.map(lambda a: a[indices], point)
