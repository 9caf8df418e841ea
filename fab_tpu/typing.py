"""Core pytree types for fab-tpu.

TPU-native rework of the reference's abstract types (fab/types_.py:5-58) and the AIS
``Point`` carrier (fab/sampling_methods/base.py:7-47). Where the reference uses a
mutable class with fancy indexing for row replacement, we use a frozen NamedTuple
pytree; row replacement is done with ``jnp.where`` masks so every shape stays static
under ``jit``.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp

Array = jnp.ndarray
# Maps a batch of points [B, D] to log-probabilities [B].
LogProbFn = Callable[[Array], Array]


class Point(NamedTuple):
    """A batch of points in an AIS chain, with cached log-probs (and score terms).

    Mirrors the information content of the reference Point
    (fab/sampling_methods/base.py:7-47): caching log_q/log_p (and their gradients for
    gradient-based transition kernels) saves re-evaluating the flow/target inside the
    MCMC inner loops.

    ``grad_log_q``/``grad_log_p`` are ``None`` for gradient-free kernels (Metropolis);
    the pytree structure is decided statically by the transition-operator choice.
    """

    x: Array  # [B, D]
    log_q: Array  # [B]
    log_p: Array  # [B]
    grad_log_q: Optional[Array] = None  # [B, D]
    grad_log_p: Optional[Array] = None  # [B, D]


def select_point(pred: Array, a: Point, b: Point) -> Point:
    """Per-row select between two Points: rows of ``a`` where pred else ``b``.

    Replaces the reference's in-place ``point[accept] = proposed[accept]``
    (fab/sampling_methods/base.py:41-47) with a masked functional update.
    ``pred`` has shape [B].
    """
    pred_col = pred[:, None]
    return Point(
        x=jnp.where(pred_col, a.x, b.x),
        log_q=jnp.where(pred, a.log_q, b.log_q),
        log_p=jnp.where(pred, a.log_p, b.log_p),
        grad_log_q=None
        if a.grad_log_q is None
        else jnp.where(pred_col, a.grad_log_q, b.grad_log_q),
        grad_log_p=None
        if a.grad_log_p is None
        else jnp.where(pred_col, a.grad_log_p, b.grad_log_p),
    )
