"""Wrap a haiku multi-transform as a trainable fab-tpu Flow.

Counterpart of the reference's alternate-backend wrapper (fab/wrappers/nflow.py:8-31)
— a second external-library adaptor proving the wrapper seam is generic. Usage:

    def sample_and_log_prob(key, n): ...   # haiku code, shared modules
    def log_prob(x): ...

    transformed = hk.multi_transform(lambda: (
        sample_and_log_prob, {"sample_and_log_prob": sample_and_log_prob,
                              "log_prob": log_prob}))
    flow = WrappedHaikuFlow(transformed, dim)

The apply fns must be keyless haiku (``hk.without_apply_rng``-style) with explicit
key arguments, keeping the wrapper a pure function of the params.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class WrappedHaikuFlow:
    transformed: Any  # hk.MultiTransformed with apply dict
    dim: int

    @property
    def event_shape(self) -> Tuple[int, ...]:
        return (self.dim,)

    def _apply(self, name: str):
        apply = self.transformed.apply
        if isinstance(apply, dict):
            return apply[name]
        return getattr(apply, name, None) or apply[name]

    def init(self, key: jax.Array, dtype=jnp.float32):
        del dtype
        key_init, key_sample = jax.random.split(key)
        return self.transformed.init(key_init, key_sample, 2)

    def sample_and_log_prob(self, params, key: jax.Array, n: int):
        from fab_tpu.parallel.mesh import constrain_batch

        x, log_q = self._apply("sample_and_log_prob")(params, None, key, n)
        return constrain_batch(x), log_q

    def sample(self, params, key: jax.Array, n: int) -> Array:
        return self.sample_and_log_prob(params, key, n)[0]

    def log_prob(self, params, x: Array) -> Array:
        return self._apply("log_prob")(params, None, x)

    def param_sharding(self, model_axis: str = "model"):
        from jax.sharding import PartitionSpec as P

        return jax.tree.map(lambda _: P(), self.init(jax.random.key(0)))
