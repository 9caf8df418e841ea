"""Replay buffers (prioritised + uniform) as pure functional device state.

Rework of fab/utils/prioritised_replay_buffer.py:20-153 and
fab/utils/replay_buffer.py:11-97. The buffer is a pytree of fixed-shape device arrays
(ring storage), so add/sample/adjust all compile into the training step:

- add: ring write via scatter at (arange + cursor) % max_length
  (prioritised_replay_buffer.py:71-85), invalid rows are written with priority -inf.
- sample: priority ~ softmax(log_w); without replacement via Gumbel-top-k
  (prioritised_replay_buffer.py:10-17), with replacement via categorical. Unwritten
  slots carry log_w = -inf so they can never be drawn — this replaces the reference's
  dynamic [:max_index] slice with a static-shape mask.
- adjust: scatter-add of log-weight adjustments; rows whose adjustment went non-finite
  are killed with priority -inf (prioritised_replay_buffer.py:116-131).

Sharding: rows are laid out over the data axis of the mesh; Gumbel-top-k over the full
logits vector lowers to a per-shard top-k + global merge under pjit.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from fab_tpu.typing import Array

_NEG_INF = -jnp.inf


class PrioritisedBufferState(NamedTuple):
    """Ring storage: x [N, D], log_w [N] (priority), log_q_old [N], cursor, filled."""

    x: Array
    log_w: Array
    log_q_old: Array
    cursor: Array  # scalar int32: next write position
    n_added: Array  # scalar int64-ish: total rows ever written (saturating add)


@dataclasses.dataclass(frozen=True)
class PrioritisedReplayBuffer:
    """Static config (fab/utils/prioritised_replay_buffer.py:21-47)."""

    dim: int
    max_length: int
    min_sample_length: int
    sample_with_replacement: bool = False

    def __post_init__(self):
        assert self.min_sample_length < self.max_length

    def init(self, dtype=jnp.float32) -> PrioritisedBufferState:
        from fab_tpu.parallel.mesh import constrain_batch

        return PrioritisedBufferState(
            x=constrain_batch(jnp.zeros((self.max_length, self.dim), dtype)),
            log_w=constrain_batch(jnp.full((self.max_length,), _NEG_INF, dtype)),
            log_q_old=constrain_batch(jnp.zeros((self.max_length,), dtype)),
            cursor=jnp.zeros((), jnp.int32),
            n_added=jnp.zeros((), jnp.int32),
        )

    def can_sample(self, state: PrioritisedBufferState) -> Array:
        return state.n_added >= self.min_sample_length

    def add(
        self,
        state: PrioritisedBufferState,
        x: Array,
        log_w: Array,
        log_q_old: Array,
        mask: Array = None,
    ) -> PrioritisedBufferState:
        """Ring-write a batch (prioritised_replay_buffer.py:71-85).

        Invalid rows (mask=False) still consume slots (keeping shapes static, like the
        reference's cursor advance) but are written with priority -inf.
        """
        batch = x.shape[0]
        if mask is not None:
            log_w = jnp.where(mask, log_w, _NEG_INF)
        log_w = jnp.where(jnp.isfinite(log_w), log_w, _NEG_INF)
        idx = (jnp.arange(batch) + state.cursor) % self.max_length
        return PrioritisedBufferState(
            x=state.x.at[idx].set(x),
            log_w=state.log_w.at[idx].set(log_w),
            log_q_old=state.log_q_old.at[idx].set(log_q_old),
            cursor=(state.cursor + batch) % self.max_length,
            n_added=jnp.minimum(
                state.n_added + batch, jnp.asarray(2**31 - 1, jnp.int32)
            ),
        )

    def sample(
        self, state: PrioritisedBufferState, key: jax.Array, batch_size: int
    ) -> Tuple[Array, Array, Array, Array]:
        """Priority sampling proportional to softmax(log_w).

        Without replacement uses the Gumbel-top-k trick
        (prioritised_replay_buffer.py:10-17); the reference's post-hoc random
        permutation of the top-k indices is skipped (the set is identical and order
        is irrelevant to the replay gradient steps).
        Returns (x, log_w, log_q_old, indices).
        """
        if self.sample_with_replacement:
            indices = jax.random.categorical(
                key, state.log_w, shape=(batch_size,)
            )
        else:
            g = jax.random.gumbel(key, state.log_w.shape, state.log_w.dtype)
            perturbed = jnp.where(
                jnp.isfinite(state.log_w), state.log_w + g, _NEG_INF
            )
            _, indices = jax.lax.top_k(perturbed, batch_size)
        return (
            state.x[indices],
            state.log_w[indices],
            state.log_q_old[indices],
            indices,
        )

    def sample_n_batches(
        self,
        state: PrioritisedBufferState,
        key: jax.Array,
        batch_size: int,
        n_batches: int,
    ):
        """One big draw chunked into n_batches (prioritised_replay_buffer.py:104-114).

        Returns arrays with leading axis n_batches, ready for ``lax.scan`` over the
        replay gradient steps.
        """
        x, log_w, log_q_old, indices = self.sample(
            state, key, batch_size * n_batches
        )
        reshape = lambda a: a.reshape((n_batches, batch_size) + a.shape[1:])
        return reshape(x), reshape(log_w), reshape(log_q_old), reshape(indices)

    def adjust(
        self,
        state: PrioritisedBufferState,
        log_w_adjustment: Array,
        log_q: Array,
        indices: Array,
    ) -> PrioritisedBufferState:
        """Apply priority adjustment after a flow update
        (prioritised_replay_buffer.py:116-131): log_w += adjustment, log_q_old
        refreshed; rows with non-finite adjustment/log_q are killed (priority -inf).
        """
        valid = jnp.isfinite(log_w_adjustment) & jnp.isfinite(log_q)
        new_log_w = jnp.where(
            valid, state.log_w[indices] + log_w_adjustment, _NEG_INF
        )
        new_log_q = jnp.where(valid, log_q, state.log_q_old[indices])
        return state._replace(
            log_w=state.log_w.at[indices].set(new_log_w),
            log_q_old=state.log_q_old.at[indices].set(new_log_q),
        )


class UniformBufferState(NamedTuple):
    """Ring storage for the (deprecated in reference) uniform replay buffer."""

    x: Array
    log_w: Array
    add_count: Array  # [N] int32: insertion counter per row, for recency weighting
    cursor: Array
    n_added: Array


@dataclasses.dataclass(frozen=True)
class ReplayBuffer:
    """Uniform/recency-weighted replay buffer (fab/utils/replay_buffer.py:11-97)."""

    dim: int
    max_length: int
    min_sample_length: int
    temperature: float = 0.0  # recency weighting (1/rank)^temperature

    def __post_init__(self):
        assert self.min_sample_length <= self.max_length

    def init(self, dtype=jnp.float32) -> UniformBufferState:
        return UniformBufferState(
            x=jnp.zeros((self.max_length, self.dim), dtype),
            log_w=jnp.full((self.max_length,), _NEG_INF, dtype),
            add_count=jnp.full((self.max_length,), -1, jnp.int32),
            cursor=jnp.zeros((), jnp.int32),
            n_added=jnp.zeros((), jnp.int32),
        )

    def can_sample(self, state: UniformBufferState) -> Array:
        return state.n_added >= self.min_sample_length

    def add(
        self,
        state: UniformBufferState,
        x: Array,
        log_w: Array,
        mask: Array = None,
    ) -> UniformBufferState:
        batch = x.shape[0]
        if mask is not None:
            log_w = jnp.where(mask, log_w, _NEG_INF)
        idx = (jnp.arange(batch) + state.cursor) % self.max_length
        return UniformBufferState(
            x=state.x.at[idx].set(x),
            log_w=state.log_w.at[idx].set(log_w),
            add_count=state.add_count.at[idx].set(
                state.n_added + jnp.arange(batch, dtype=jnp.int32)
            ),
            cursor=(state.cursor + batch) % self.max_length,
            n_added=jnp.minimum(
                state.n_added + batch, jnp.asarray(2**31 - 1, jnp.int32)
            ),
        )

    def sample(
        self, state: UniformBufferState, key: jax.Array, batch_size: int
    ) -> Tuple[Array, Array]:
        """Recency-weighted sampling: weight = (1/rank)^temperature over written rows
        (replay_buffer.py:76-87), rank 1 = newest."""
        written = state.add_count >= 0
        rank = (state.n_added - state.add_count).astype(jnp.float32)
        logits = jnp.where(written, -self.temperature * jnp.log(rank), _NEG_INF)
        indices = jax.random.categorical(key, logits, shape=(batch_size,))
        return state.x[indices], state.log_w[indices]
