"""Prioritised/uniform replay buffer tests.

Covers the add/sample/adjust cycle of the reference's inline smoke test
(fab/utils/prioritised_replay_buffer.py:158-171) plus priority semantics, ring
wrap-around, and invalid-row handling.
"""
import jax
import jax.numpy as jnp
import numpy as np

from fab_tpu.buffer import PrioritisedReplayBuffer, ReplayBuffer


def test_add_sample_adjust_cycle(key):
    dim, batch = 5, 3
    buf = PrioritisedReplayBuffer(dim=dim, max_length=6, min_sample_length=3)
    state = buf.init()
    assert not bool(buf.can_sample(state))
    for i in range(100):
        key, k1, k2 = jax.random.split(key, 3)
        state = buf.add(
            state, jnp.ones((batch, dim)) * i, jnp.zeros(batch), jnp.ones(batch)
        )
        assert bool(buf.can_sample(state))
        x, log_w, log_q_old, idx = buf.sample(state, k2, batch)
        state = buf.adjust(state, log_w + 1, log_q_old + 0.1, idx)
    assert bool(jnp.all(jnp.isfinite(state.log_w)))


def test_ring_wraparound():
    buf = PrioritisedReplayBuffer(dim=1, max_length=4, min_sample_length=2)
    state = buf.init()
    state = buf.add(state, jnp.arange(3.0)[:, None], jnp.zeros(3), jnp.zeros(3))
    state = buf.add(state, 10 + jnp.arange(3.0)[:, None], jnp.zeros(3), jnp.zeros(3))
    # Second add writes 10@3, 11@0, 12@1 -> slots [11, 12, 2, 10], cursor at 2.
    np.testing.assert_allclose(
        np.asarray(state.x).ravel(), [11.0, 12.0, 2.0, 10.0]
    )
    assert int(state.cursor) == 2


def test_priority_sampling_prefers_high_log_w(key):
    buf = PrioritisedReplayBuffer(
        dim=1, max_length=100, min_sample_length=10, sample_with_replacement=True
    )
    state = buf.init()
    x = jnp.arange(100.0)[:, None]
    log_w = jnp.where(jnp.arange(100) < 5, 10.0, -10.0)  # 5 hot rows
    state = buf.add(state, x, log_w, jnp.zeros(100))
    xs, *_ = buf.sample(state, key, 1000)
    assert float(jnp.mean(xs < 5)) > 0.99


def test_without_replacement_unique_and_skips_neg_inf(key):
    buf = PrioritisedReplayBuffer(dim=1, max_length=64, min_sample_length=8)
    state = buf.init()
    # Write only 32 rows: the other 32 stay at -inf priority (unwritten).
    state = buf.add(
        state, jnp.arange(32.0)[:, None], jnp.zeros(32), jnp.zeros(32)
    )
    x, log_w, _, idx = buf.sample(state, key, 16)
    assert len(np.unique(np.asarray(idx))) == 16  # no replacement
    assert bool(jnp.all(idx < 32))  # never drew an unwritten slot
    assert bool(jnp.all(jnp.isfinite(log_w)))


def test_adjust_kills_nonfinite(key):
    buf = PrioritisedReplayBuffer(dim=1, max_length=8, min_sample_length=2)
    state = buf.init()
    state = buf.add(state, jnp.zeros((4, 1)), jnp.zeros(4), jnp.zeros(4))
    adj = jnp.array([0.5, jnp.nan, 0.5, jnp.inf])
    state = buf.adjust(state, adj, jnp.zeros(4), jnp.arange(4))
    lw = np.asarray(state.log_w)
    np.testing.assert_allclose(lw[0], 0.5)
    assert np.isneginf(lw[1]) and np.isneginf(lw[3])
    np.testing.assert_allclose(lw[2], 0.5)


def test_add_masks_invalid_rows():
    buf = PrioritisedReplayBuffer(dim=1, max_length=8, min_sample_length=2)
    state = buf.init()
    mask = jnp.array([True, False, True])
    state = buf.add(
        state, jnp.ones((3, 1)), jnp.zeros(3), jnp.zeros(3), mask=mask
    )
    lw = np.asarray(state.log_w)
    assert np.isneginf(lw[1]) and lw[0] == 0.0 and lw[2] == 0.0


def test_buffer_ops_jit_compatible(key):
    """add/sample/adjust must compose inside one jitted program."""
    buf = PrioritisedReplayBuffer(dim=2, max_length=32, min_sample_length=4)

    @jax.jit
    def step(state, key):
        k1, k2 = jax.random.split(key)
        x = jax.random.normal(k1, (8, 2))
        state = buf.add(state, x, jnp.zeros(8), jnp.zeros(8))
        xs, lws, lqs, idx = buf.sample(state, k2, 4)
        return buf.adjust(state, lws * 0.5, lqs, idx)

    state = buf.init()
    for i in range(3):
        state = step(state, jax.random.fold_in(key, i))
    assert int(state.n_added) == 24


def test_uniform_buffer_recency(key):
    buf = ReplayBuffer(dim=1, max_length=64, min_sample_length=4, temperature=1.0)
    state = buf.init()
    for i in range(8):
        state = buf.add(
            state, jnp.full((8, 1), float(i)), jnp.zeros(8)
        )
    x, _ = buf.sample(state, key, 2000)
    # temperature=1: newer rows (higher value) sampled more often.
    assert float(jnp.mean(x)) > 4.0
