"""Batched rejection sampling, jit-compatible.

Rework of fab/sampling_methods/rejection_sampling.py:6-20: the reference recursively
re-draws until it has n accepted samples (dynamic shapes); here we draw fixed-size
proposal batches inside a ``lax.while_loop`` and fill a static output buffer with
accepted draws, so the whole sampler compiles to one XLA program.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def rejection_sampling(
    key: jax.Array,
    n_samples: int,
    proposal_sample: Callable[[jax.Array, int], Array],
    proposal_log_prob: Callable[[Array], Array],
    target_log_prob_fn: Callable[[Array], Array],
    k: float,
    batch_multiplier: int = 2,
) -> Array:
    """Sample from (unnormalised) target via rejection with envelope k * proposal.

    ``proposal_sample(key, n)`` returns [n] or [n, D] draws; accepted draws fill an
    [n_samples, ...] buffer until full.
    """
    log_k = jnp.log(k)
    probe = proposal_sample(key, 1)
    out_shape = (n_samples,) + probe.shape[1:]
    batch = n_samples * batch_multiplier

    def cond(state):
        _, n_filled, _ = state
        return n_filled < n_samples

    def body(state):
        key, n_filled, out = state
        key, key_prop, key_u = jax.random.split(key, 3)
        z = proposal_sample(key_prop, batch)
        log_u = jnp.log(jax.random.uniform(key_u, (batch,)))
        # Accept iff u < target(z) / (k * proposal(z)).
        accept = log_u < target_log_prob_fn(z) - (proposal_log_prob(z) + log_k)
        # Scatter accepted draws into the next free slots of the output buffer;
        # rejected/overflow rows get an out-of-range index and are dropped.
        offset = jnp.cumsum(accept) - 1 + n_filled
        idx = jnp.where(accept, offset, n_samples)
        out = out.at[idx].set(z, mode="drop")
        return key, jnp.minimum(n_filled + jnp.sum(accept), n_samples), out

    out0 = jnp.zeros(out_shape, probe.dtype)
    _, _, out = jax.lax.while_loop(cond, body, (key, jnp.array(0), out0))
    return out
