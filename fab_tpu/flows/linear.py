"""Invertible linear (LU-parametrised) and ActNorm bijectors.

Equivalents of the reference's mixing + normalisation layers
(nf.flows.InvertibleAffine / nf.flows.ActNorm used at
experiments/make_flow/make_normflow_model.py:26-29). The LU parametrisation keeps both
directions and the log-det O(D^2)/O(D) without any matrix inverse or determinant at run
time: W = L (U + diag(sign * exp(log_s))) with L unit-lower-triangular. The
initialisation is the LU factorisation of (a row-permutation of) a random rotation, so
W starts orthogonal — the permutation factor is folded out so the param pytree holds
only trainable float leaves.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fab_tpu.flows.base import Bijector

Array = jnp.ndarray


def _lu_pieces(params):
    dim = params["lower"].shape[0]
    dtype = params["lower"].dtype
    l = jnp.tril(params["lower"], k=-1) + jnp.eye(dim, dtype=dtype)
    # sign_s is a fixed +-1 sign pattern, NOT a trainable magnitude: the log-det is
    # computed as sum(log_s) assuming |sign_s| = 1, so any optimiser drift in
    # sign_s would silently unnormalise the flow (log q off by a constant that
    # softmax-based losses cannot see but every log-prob metric does). The
    # stop_gradient keeps it frozen.
    u = jnp.triu(params["upper"], k=1) + jnp.diag(
        jax.lax.stop_gradient(params["sign_s"]) * jnp.exp(params["log_s"])
    )
    return l, u


@dataclasses.dataclass(frozen=True)
class LULinear(Bijector):
    """y = x @ W^T with W = L (U + diag(s)), initialised from a random rotation."""

    identity_init: bool = False

    def init(self, key: jax.Array, dim: int, dtype=jnp.float32):
        if self.identity_init:
            l0 = np.eye(dim)
            u0 = np.eye(dim)
        else:
            # Random orthogonal init via QR, seeded from the JAX key for determinism.
            seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
            rng = np.random.RandomState(seed)
            w0, _ = np.linalg.qr(rng.randn(dim, dim))
            import scipy.linalg

            # w0 = P L U  =>  parametrise W = L U = P^T w0 (still orthogonal).
            _, l0, u0 = scipy.linalg.lu(w0)
        s = np.diag(u0).copy()
        return {
            "lower": jnp.asarray(np.tril(l0, k=-1), dtype),
            "upper": jnp.asarray(np.triu(u0, k=1), dtype),
            "log_s": jnp.asarray(np.log(np.abs(s)), dtype),
            "sign_s": jnp.asarray(np.sign(s), dtype),
        }

    def forward_and_log_det(self, params, z: Array) -> Tuple[Array, Array]:
        l, u = _lu_pieces(params)
        w = jnp.dot(l, u, preferred_element_type=l.dtype)
        y = jnp.dot(z, w.T, preferred_element_type=z.dtype)
        log_det = jnp.sum(params["log_s"])
        return y, jnp.broadcast_to(log_det, z.shape[:-1])

    def inverse_and_log_det(self, params, x: Array) -> Tuple[Array, Array]:
        # Materialise W^-1 = U^-1 L^-1 with two D x D triangular solves (done once,
        # independent of batch), then apply as a single MXU matmul — much faster on
        # TPU than per-row triangular solves over the particle axis, and this is the
        # hot density-evaluation path (log q inside every HMC leapfrog step).
        l, u = _lu_pieces(params)
        eye = jnp.eye(l.shape[0], dtype=l.dtype)
        l_inv = jax.scipy.linalg.solve_triangular(l, eye, lower=True)
        w_inv = jax.scipy.linalg.solve_triangular(u, l_inv, lower=False)
        z = jnp.dot(x, w_inv.T, preferred_element_type=x.dtype)
        log_det = -jnp.sum(params["log_s"])
        return z, jnp.broadcast_to(log_det, x.shape[:-1])

    def param_sharding(self, dim: int, model_axis: str):
        from jax.sharding import PartitionSpec as P

        return {k: P() for k in ("lower", "upper", "log_s", "sign_s")}


@dataclasses.dataclass(frozen=True)
class ActNorm(Bijector):
    """Per-dimension affine y = x * exp(log_scale) + shift.

    The reference's ActNorm layers are data-dependently initialised by pushing a warm-up
    sample through the flow (make_normflow_model.py:95); use
    ``fab_tpu.flows.factory.data_dependent_init`` for the same effect.
    """

    def init(self, key: jax.Array, dim: int, dtype=jnp.float32):
        del key
        return {
            "shift": jnp.zeros((dim,), dtype),
            "log_scale": jnp.zeros((dim,), dtype),
        }

    def forward_and_log_det(self, params, z: Array) -> Tuple[Array, Array]:
        y = z * jnp.exp(params["log_scale"]) + params["shift"]
        log_det = jnp.sum(params["log_scale"])
        return y, jnp.broadcast_to(log_det, z.shape[:-1])

    def inverse_and_log_det(self, params, x: Array) -> Tuple[Array, Array]:
        z = (x - params["shift"]) * jnp.exp(-params["log_scale"])
        log_det = -jnp.sum(params["log_scale"])
        return z, jnp.broadcast_to(log_det, x.shape[:-1])

    def param_sharding(self, dim: int, model_axis: str):
        from jax.sharding import PartitionSpec as P

        return {"shift": P(), "log_scale": P()}
