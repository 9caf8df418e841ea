"""Numerical utilities: effective sample size, importance-weighted expectations.

TPU-native rework of fab/utils/numerical.py:8-60. All estimators take an optional
validity ``mask``: the reference drops NaN/Inf rows, which changes batch shape
dynamically (fab/sampling_methods/ais.py:190-213); on TPU we keep shapes static and
exclude invalid rows from every reduction instead.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray

_NEG_INF = -jnp.inf


def masked_log_weights(log_w: Array, mask: Optional[Array]) -> Array:
    """Set log-weights of invalid rows to -inf so they vanish under softmax."""
    if mask is None:
        return log_w
    return jnp.where(mask, log_w, _NEG_INF)


def effective_sample_size(
    log_w: Array, mask: Optional[Array] = None, normalised: bool = False
) -> Array:
    """Normalised ESS of importance weights: ``1 / (N * sum(w_bar**2))``.

    Matches fab/utils/numerical.py:18-23 (see arXiv:1602.03572); with a mask, N is the
    number of valid rows (the reference drops invalid rows, shrinking N the same way).
    """
    assert log_w.ndim == 1
    log_w = masked_log_weights(log_w, mask)
    if not normalised:
        w_bar = jax.nn.softmax(log_w, axis=0)
    else:
        w_bar = log_w  # already normalised weights, matching the reference's branch
    n = log_w.shape[0] if mask is None else jnp.maximum(jnp.sum(mask), 1)
    return 1.0 / jnp.sum(w_bar**2) / n


def effective_sample_size_over_p(log_w: Array, mask: Optional[Array] = None) -> Array:
    """ESS estimated from target samples: ``1 / mean(exp(log_w))``.

    Requires a normalised target log-prob (fab/utils/numerical.py:25-30).
    """
    assert log_w.ndim == 1
    if mask is None:
        return 1.0 / jnp.mean(jnp.exp(log_w))
    n = jnp.maximum(jnp.sum(mask), 1)
    return 1.0 / (jnp.sum(jnp.where(mask, jnp.exp(log_w), 0.0)) / n)


def log_z_estimate(log_w: Array, mask: Optional[Array] = None) -> Array:
    """Estimate log normalising constant: ``logsumexp(log_w) - log N``.

    Matches fab/sampling_methods/ais.py:83-84.
    """
    log_w = masked_log_weights(log_w, mask)
    n = log_w.shape[0] if mask is None else jnp.maximum(jnp.sum(mask), 1)
    return jax.scipy.special.logsumexp(log_w, axis=0) - jnp.log(n.astype(log_w.dtype) if mask is not None else float(n))


def importance_weighted_expectation(
    f: Callable[[Array], Array], x: Array, log_w: Array, mask: Optional[Array] = None
) -> Array:
    """Self-normalised importance-sampling estimate of E_p[f(x)].

    Matches fab/utils/numerical.py:55-60.
    """
    w_bar = jax.nn.softmax(masked_log_weights(log_w, mask), axis=0)
    f_x = f(x)
    if mask is not None:
        f_x = jnp.where(mask, f_x, 0.0)
    return jnp.sum(w_bar * f_x, axis=0)


def mc_estimate_true_expectation(
    sample_fn: Callable[[jax.Array, int], Array],
    expectation_function: Callable[[Array], Array],
    n_samples: int,
    key: jax.Array,
    batch_size: int = 100_000,
) -> Array:
    """Plain MC estimate of E[f(x)] with exact samples (fab/utils/numerical.py:8-15).

    Chunked so huge n_samples (reference uses 1e7, fab/target_distributions/gmm.py:15)
    never materialise at once on-device.
    """
    n_batches = max(n_samples // batch_size, 1)

    def body(carry, key_i):
        x = sample_fn(key_i, batch_size)
        return carry + jnp.sum(expectation_function(x)), None

    keys = jax.random.split(key, n_batches)
    total, _ = jax.lax.scan(body, jnp.zeros(()), keys)
    return total / (n_batches * batch_size)


def quadratic_function(x: Array, seed: int = 0) -> Array:
    """Fixed-seed quadratic test function used for expectation-bias metrics.

    Parity port of fab/utils/numerical.py:33-51: the constants are the exact draws of
    torch's RNG at the given seed (see utils/seeding.py), so bias metrics are directly
    comparable with the reference.
    """
    from fab_tpu.utils.seeding import quadratic_constants

    x_shift, a_mat, b_vec = quadratic_constants(x.shape[-1], seed)
    x_shift = jnp.asarray(x_shift, dtype=x.dtype)
    a_mat = jnp.asarray(a_mat, dtype=x.dtype)
    b_vec = jnp.asarray(b_vec, dtype=x.dtype)
    x = x + x_shift
    return jnp.einsum("...i,ij,...j->...", x, a_mat, x) + jnp.einsum(
        "j,...j->...", b_vec, x
    )
