"""Wrap a stateless JAX distribution object (or callables) as a fab-tpu Flow.

Counterpart of the reference's ``WrappedTorchDist`` usage pattern — a fixed,
non-trainable distribution dropped in wherever the ``Distribution`` protocol is
expected (fab/wrappers/torch.py:7-23; used as AIS base in its tests). Accepts either:

- a distrax/TFP-style object with ``sample(seed=key, sample_shape=(n,))`` and
  ``log_prob(x)`` (duck-typed; neither library is a dependency), or
- an object with fab-tpu-style ``sample(key, n)``, or
- explicit ``(sample_fn, log_prob_fn)`` callables via ``from_callables``.

Everything traces into XLA; there is no host boundary.
"""
from __future__ import annotations

import dataclasses
import inspect
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _adapt_sample(dist: Any) -> Callable[[jax.Array, int], Array]:
    sig = None
    try:
        sig = inspect.signature(dist.sample)
    except (TypeError, ValueError):
        pass
    params = set(sig.parameters) if sig is not None else set()
    if {"seed"} & params or {"sample_shape"} & params:
        # distrax / TFP convention.
        return lambda key, n: dist.sample(seed=key, sample_shape=(n,))
    return lambda key, n: dist.sample(key, n)


@dataclasses.dataclass(frozen=True)
class WrappedJaxDist:
    """Adapt a stateless JAX distribution to the Flow API (no trainable params)."""

    sample_fn: Callable[[jax.Array, int], Array]
    log_prob_fn: Callable[[Array], Array]
    dim: int

    @classmethod
    def wrap(cls, dist: Any, dim: Optional[int] = None) -> "WrappedJaxDist":
        if dim is None:
            event_shape = getattr(dist, "event_shape", None)
            if not event_shape:
                raise ValueError(
                    "dim not given and the distribution has no event_shape"
                )
            dim = int(event_shape[-1])
        return cls(_adapt_sample(dist), dist.log_prob, dim)

    @classmethod
    def from_callables(
        cls,
        sample_fn: Callable[[jax.Array, int], Array],
        log_prob_fn: Callable[[Array], Array],
        dim: int,
    ) -> "WrappedJaxDist":
        return cls(sample_fn, log_prob_fn, dim)

    @property
    def event_shape(self) -> Tuple[int, ...]:
        return (self.dim,)

    def init(self, key: jax.Array, dtype=jnp.float32):
        del key, dtype
        return {}

    def sample_and_log_prob(self, params, key: jax.Array, n: int):
        del params
        x = self.sample_fn(key, n)
        return x, self.log_prob_fn(x)

    def sample(self, params, key: jax.Array, n: int) -> Array:
        del params
        return self.sample_fn(key, n)

    def log_prob(self, params, x: Array) -> Array:
        del params
        return self.log_prob_fn(x)

    def param_sharding(self, model_axis: str = "model"):
        return {}
