"""Flow core: bijector protocol, diagonal-Gaussian base, and the composed Flow.

This replaces the reference's wrapper-over-external-libraries model layer
(fab/wrappers/normflows.py:8-31, fab/trainable_distributions/base.py:4-5) with our own
stack: bijectors are *static* config objects exposing pure functions over explicit
param pytrees, so the whole flow traces into a single XLA program.

Direction convention: ``forward`` maps base -> data (the sampling direction);
``inverse`` maps data -> base (the density-evaluation direction).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray
Params = Any


def flow_log_prob(flow, params: Params, x: Array, key: jax.Array = None) -> Array:
    """log_prob that threads a PRNG key iff the flow is stochastic (SNF).

    Deterministic flows ignore the key (their log_prob is exact). Stochastic
    flows (fab_tpu/flows/snf.py StochasticFlow) require one so the MH sampling
    layers draw fresh noise — routing every in-repo call site through this
    helper keeps them on the unbiased stochastic path (the reference's SNF
    layers consume fresh torch global RNG per call,
    /root/reference/experiments/make_flow/make_normflow_model.py:33-79).
    """
    if getattr(flow, "is_stochastic", False):
        return flow.log_prob(params, x, key=key)
    return flow.log_prob(params, x)


class Bijector:
    """Static bijector config. Subclasses implement pure init/forward/inverse."""

    def init(self, key: jax.Array, dim: int, dtype=jnp.float32) -> Params:
        raise NotImplementedError

    def forward_and_log_det(self, params: Params, z: Array) -> Tuple[Array, Array]:
        """Base -> data. Returns (x, log|det J|) with log-det shaped [B]."""
        raise NotImplementedError

    def inverse_and_log_det(self, params: Params, x: Array) -> Tuple[Array, Array]:
        """Data -> base. Returns (z, log|det J^{-1}|) with log-det shaped [B]."""
        raise NotImplementedError

    def param_sharding(self, dim: int, model_axis: str):
        """PartitionSpec pytree matching init()'s params; replicated by default."""
        from jax.sharding import PartitionSpec as P

        return jax.tree.map(lambda _: P(), self.init(jax.random.key(0), dim))


@dataclasses.dataclass(frozen=True)
class DiagGaussianBase:
    """Trainable diagonal-Gaussian base distribution (loc, log_scale).

    Analogue of normflows' DiagGaussian base used by the reference RealNVP factory
    (experiments/make_flow/make_normflow_model.py:88).
    """

    dim: int

    def init(self, dtype=jnp.float32) -> Params:
        return {
            "loc": jnp.zeros((self.dim,), dtype),
            "log_scale": jnp.zeros((self.dim,), dtype),
        }

    def sample_and_log_prob(
        self, params: Params, key: jax.Array, n: int
    ) -> Tuple[Array, Array]:
        from fab_tpu.parallel.mesh import constrain_batch

        # The particle axis is born here; the sharding hint makes the whole
        # downstream FAB step partition over the mesh's data axis.
        eps = constrain_batch(jax.random.normal(key, (n, self.dim), params["loc"].dtype))
        z = params["loc"] + eps * jnp.exp(params["log_scale"])
        log_prob = self._log_prob_from_eps(params, eps)
        return z, log_prob

    def log_prob(self, params: Params, z: Array) -> Array:
        eps = (z - params["loc"]) * jnp.exp(-params["log_scale"])
        return self._log_prob_from_eps(params, eps)

    def _log_prob_from_eps(self, params: Params, eps: Array) -> Array:
        log_norm = -0.5 * self.dim * jnp.log(2 * jnp.pi) - jnp.sum(
            params["log_scale"]
        )
        return log_norm - 0.5 * jnp.sum(eps**2, axis=-1)


@dataclasses.dataclass(frozen=True)
class UniformGaussianBase:
    """Base that is uniform on circular dims and standard normal elsewhere.

    Analogue of normflows' UniformGaussian base used for the ALDP flow
    (experiments/make_flow/make_aldp_model.py:68-70): circular (periodic) internal
    coordinates get a uniform density on [-bound, bound]; the rest are N(0, 1).
    Non-trainable (params = {}), like the reference's.
    """

    dim: int
    circular_dims: Tuple[int, ...]
    circular_bound: float = float(jnp.pi)

    def init(self, dtype=jnp.float32) -> Params:
        del dtype
        return {}

    def _masks(self, dtype):
        circ = jnp.zeros((self.dim,), bool).at[jnp.asarray(self.circular_dims)].set(True)
        return circ

    def sample_and_log_prob(
        self, params: Params, key: jax.Array, n: int
    ) -> Tuple[Array, Array]:
        from fab_tpu.parallel.mesh import constrain_batch

        key_g, key_u = jax.random.split(key)
        circ = self._masks(jnp.float32)
        gauss = jax.random.normal(key_g, (n, self.dim))
        uni = jax.random.uniform(
            key_u, (n, self.dim), minval=-self.circular_bound,
            maxval=self.circular_bound,
        )
        z = constrain_batch(jnp.where(circ, uni, gauss))
        return z, self.log_prob(params, z)

    def log_prob(self, params: Params, z: Array) -> Array:
        del params
        circ = self._masks(z.dtype)
        log_gauss = -0.5 * z**2 - 0.5 * jnp.log(2 * jnp.pi)
        log_uni = jnp.where(
            jnp.abs(z) <= self.circular_bound,
            -jnp.log(2 * self.circular_bound),
            -jnp.inf,
        )
        return jnp.sum(jnp.where(circ, log_uni, log_gauss), axis=-1)


@dataclasses.dataclass(frozen=True)
class Flow:
    """A composed normalizing flow q_theta: base + chain of bijectors.

    Provides the ``Distribution`` API of the reference (fab/types_.py:8-27):
    sample / log_prob / sample_and_log_prob, as pure functions of a param pytree.
    ``base_dist`` defaults to a trainable diagonal Gaussian.
    """

    dim: int
    bijectors: Tuple[Bijector, ...]
    base_dist: object = None  # DiagGaussianBase | UniformGaussianBase

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        keys = jax.random.split(key, max(len(self.bijectors), 1))
        return {
            "base": self.base.init(dtype),
            "layers": tuple(
                b.init(k, self.dim, dtype) for b, k in zip(self.bijectors, keys)
            ),
        }

    @property
    def base(self):
        return self.base_dist if self.base_dist is not None else DiagGaussianBase(self.dim)

    @property
    def event_shape(self) -> Tuple[int, ...]:
        return (self.dim,)

    def forward_and_log_det(self, params: Params, z: Array) -> Tuple[Array, Array]:
        log_det = jnp.zeros(z.shape[:-1], z.dtype)
        for bij, p in zip(self.bijectors, params["layers"]):
            z, ld = bij.forward_and_log_det(p, z)
            log_det = log_det + ld
        return z, log_det

    def inverse_and_log_det(self, params: Params, x: Array) -> Tuple[Array, Array]:
        log_det = jnp.zeros(x.shape[:-1], x.dtype)
        for bij, p in zip(reversed(self.bijectors), reversed(params["layers"])):
            x, ld = bij.inverse_and_log_det(p, x)
            log_det = log_det + ld
        return x, log_det

    def sample_and_log_prob(
        self, params: Params, key: jax.Array, n: int
    ) -> Tuple[Array, Array]:
        z, log_q = self.base.sample_and_log_prob(params["base"], key, n)
        x, log_det = self.forward_and_log_det(params, z)
        return x, log_q - log_det

    def sample(self, params: Params, key: jax.Array, n: int) -> Array:
        return self.sample_and_log_prob(params, key, n)[0]

    def log_prob(self, params: Params, x: Array) -> Array:
        z, log_det = self.inverse_and_log_det(params, x)
        return self.base.log_prob(params["base"], z) + log_det

    def param_sharding(self, model_axis: str = "model"):
        """PartitionSpec pytree for the flow params (base replicated)."""
        from jax.sharding import PartitionSpec as P

        return {
            "base": jax.tree.map(lambda _: P(), self.base.init()),
            "layers": tuple(
                b.param_sharding(self.dim, model_axis) for b in self.bijectors
            ),
        }
