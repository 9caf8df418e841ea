"""Target-distribution interface.

TPU-native analogue of fab/target_distributions/base.py:7-36: an unnormalised
``log_prob``, optional exact ``sample``, and problem-specific ``performance_metrics``.
Targets are plain static objects (their constants are baked into the jitted programs
as closure captures); all methods are pure.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray
LogProbFn = Callable[[Array], Array]


class TargetDistribution:
    dim: int

    def log_prob(self, x: Array) -> Array:
        """Unnormalised target log-density, batched: [B, D] -> [B]."""
        raise NotImplementedError

    def sample(self, key: jax.Array, n: int) -> Array:
        """Exact samples, where available."""
        raise NotImplementedError

    def performance_metrics(
        self,
        samples: Array,
        log_w: Array,
        log_q_fn: Optional[LogProbFn] = None,
        batch_size: Optional[int] = None,
        mask: Optional[Array] = None,
        key: Optional[jax.Array] = None,
    ) -> Dict[str, Array]:
        """Problem-specific eval metrics (fab/target_distributions/base.py:14-32)."""
        raise NotImplementedError
