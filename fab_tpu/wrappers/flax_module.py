"""Wrap a flax.linen Module as a trainable fab-tpu Flow.

Counterpart of the reference's primary flow-backend wrapper
(fab/wrappers/normflows.py:8-31): where the reference adapted an external torch
``nn.Module`` flow library, this adapts a flax Module so externally-authored flax
flows plug into FABModel / the trainers unchanged.

Contract for the wrapped module: two methods with explicit PRNG-key arguments
(no flax rng collections, so the wrapper stays a pure function of the param pytree):

    def sample_and_log_prob(self, key, n) -> (x [n, dim], log_q [n])
    def log_prob(self, x [B, dim]) -> [B]
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class WrappedFlaxFlow:
    module: Any  # flax.linen.Module
    dim: int

    @property
    def event_shape(self) -> Tuple[int, ...]:
        return (self.dim,)

    def init(self, key: jax.Array, dtype=jnp.float32):
        del dtype  # the module's own dtype handling governs
        key_init, key_sample = jax.random.split(key)
        variables = self.module.init(
            key_init, key_sample, 2, method=self.module.sample_and_log_prob
        )
        return variables

    def sample_and_log_prob(self, params, key: jax.Array, n: int):
        from fab_tpu.parallel.mesh import constrain_batch

        x, log_q = self.module.apply(
            params, key, n, method=self.module.sample_and_log_prob
        )
        return constrain_batch(x), log_q

    def sample(self, params, key: jax.Array, n: int) -> Array:
        return self.sample_and_log_prob(params, key, n)[0]

    def log_prob(self, params, x: Array) -> Array:
        return self.module.apply(params, x, method=self.module.log_prob)

    def param_sharding(self, model_axis: str = "model"):
        from jax.sharding import PartitionSpec as P

        params = self.init(jax.random.key(0))
        return jax.tree.map(lambda _: P(), params)
