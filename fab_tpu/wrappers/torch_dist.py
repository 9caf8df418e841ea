"""Bridge a torch.distributions.Distribution into JAX as a fab-tpu Flow.

Counterpart of the reference's ``WrappedTorchDist`` (fab/wrappers/torch.py:7-23),
which it used as the AIS base distribution in tests. Here the roles are inverted —
torch is the *foreign* runtime — so the bridge crosses the host boundary via
``jax.pure_callback``:

- ``log_prob`` carries a ``jax.custom_vjp`` whose backward pass runs torch autograd
  on the host, so gradient-based transition kernels (HMC) work through it.
- ``sample`` re-seeds torch's CPU generator from the folded JAX key so draws are
  deterministic per key (and distinct across keys/vmap instances).

This is a parity/testing tool (host-side, CPU): cross-checking fab-tpu statistics
against torch-native densities. It is not a TPU compute path.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def _to_torch(x: np.ndarray):
    import torch

    # Copy: callback outputs arrive as read-only numpy views, which torch rejects.
    return torch.as_tensor(np.array(x, dtype=np.float64))


@dataclasses.dataclass(frozen=True)
class WrappedTorchDist:
    dist: Any  # torch.distributions.Distribution
    dim: int

    @classmethod
    def wrap(cls, dist: Any) -> "WrappedTorchDist":
        event_shape = tuple(dist.event_shape)
        if len(event_shape) != 1:
            raise ValueError(
                f"expected a 1-D event shape, got {event_shape} "
                "(batch the distribution over a single event axis)"
            )
        return cls(dist, int(event_shape[0]))

    @property
    def event_shape(self) -> Tuple[int, ...]:
        return (self.dim,)

    def init(self, key: jax.Array, dtype=jnp.float32):
        del key, dtype
        return {}

    # -- host-side primitives ------------------------------------------------
    def _host_log_prob(self, x: np.ndarray) -> np.ndarray:
        return self.dist.log_prob(_to_torch(x)).numpy().astype(np.float32)

    def _host_grad_log_prob(self, x: np.ndarray, ct: np.ndarray) -> np.ndarray:
        import torch

        xt = _to_torch(x).requires_grad_(True)
        lp = self.dist.log_prob(xt)
        (grad,) = torch.autograd.grad(lp.sum(), xt)
        return (grad.numpy() * np.asarray(ct, np.float64)[..., None]).astype(
            np.float32
        )

    def _host_sample(self, seed: np.ndarray, n: int) -> np.ndarray:
        import torch

        gen_state = torch.random.get_rng_state()
        try:
            torch.manual_seed(int(np.uint32(seed)))
            x = self.dist.sample((n,))
        finally:
            torch.random.set_rng_state(gen_state)
        return x.numpy().astype(np.float32)

    # -- JAX surface ----------------------------------------------------------
    def log_prob(self, params, x: Array) -> Array:
        del params

        @jax.custom_vjp
        def lp(x):
            return jax.pure_callback(
                self._host_log_prob,
                jax.ShapeDtypeStruct(x.shape[:-1], jnp.float32),
                x,
                vmap_method="expand_dims",
            )

        def lp_fwd(x):
            return lp(x), x

        def lp_bwd(x, ct):
            grad = jax.pure_callback(
                self._host_grad_log_prob,
                jax.ShapeDtypeStruct(x.shape, jnp.float32),
                x,
                ct,
                vmap_method="expand_dims",
            )
            return (grad.astype(x.dtype),)

        lp.defvjp(lp_fwd, lp_bwd)
        return lp(x).astype(x.dtype)

    def sample(self, params, key: jax.Array, n: int) -> Array:
        del params
        seed = jax.random.randint(key, (), 0, np.iinfo(np.int32).max)
        return jax.pure_callback(
            partial(self._host_sample, n=n),
            jax.ShapeDtypeStruct((n, self.dim), jnp.float32),
            seed,
        )

    def sample_and_log_prob(self, params, key: jax.Array, n: int):
        x = self.sample(params, key, n)
        return x, self.log_prob(params, x)

    def param_sharding(self, model_axis: str = "model"):
        return {}
