"""Masked affine autoregressive flow (MAF/IAF-style bijector).

Equivalent of the reference's alternative nflows backend demo
(experiments/make_flow/make_masked_affine_nflows.py: MaskedAffineAutoregressive
layers + random permutations). The conditioner is a MADE-masked MLP; the
density-evaluation direction (data -> base) is a single parallel pass; the sampling
direction is a `lax.scan` over dimensions (inherently sequential).

Direction convention note: because FAB evaluates log q heavily inside the AIS chain
(create_point at every leapfrog step, SURVEY §3.1), we orient the *inverse*
(density) direction as the parallel one — i.e. this is a MAF.
"""
from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fab_tpu.flows.base import Bijector

Array = jnp.ndarray


def _made_masks(dim: int, hidden: List[int], key_seed: int):
    """MADE degree-based masks for an autoregressive MLP [dim, *hidden, 2*dim]."""
    rng = np.random.RandomState(key_seed)
    degrees = [np.arange(1, dim + 1)]
    for h in hidden:
        degrees.append(rng.randint(1, dim, size=h) if dim > 1 else np.ones(h, int))
    masks = []
    for d_in, d_out in zip(degrees[:-1], degrees[1:]):
        masks.append((d_out[:, None] >= d_in[None, :]).T.astype(np.float32))
    # Output layer: strict inequality so dim i depends only on dims < i; two output
    # slots (shift, log_scale) per dim.
    d_last = degrees[-1]
    out_deg = np.tile(np.arange(1, dim + 1), 2)
    masks.append((out_deg[:, None] > d_last[None, :]).T.astype(np.float32))
    return masks


@dataclasses.dataclass(frozen=True)
class MaskedAffineAutoregressive(Bijector):
    """z_i = (x_i - shift_i(x_<i)) * exp(-log_scale_i(x_<i)) in the inverse
    (parallel, density) direction; sampling solves sequentially."""

    hidden_units: int = 64
    n_hidden_layers: int = 2
    mask_seed: int = 0
    scale_cap: float = 3.0

    def init(self, key: jax.Array, dim: int, dtype=jnp.float32):
        hidden = [self.hidden_units] * self.n_hidden_layers
        sizes = [dim] + hidden + [2 * dim]
        keys = jax.random.split(key, len(sizes) - 1)
        params = []
        for i, (d_in, d_out) in enumerate(zip(sizes[:-1], sizes[1:])):
            last = i == len(sizes) - 2
            w = (
                jnp.zeros((d_in, d_out), dtype)
                if last
                else jax.random.normal(keys[i], (d_in, d_out), dtype)
                * jnp.sqrt(2.0 / d_in)
            )
            params.append({"w": w, "b": jnp.zeros((d_out,), dtype)})
        return {"mlp": params}

    def _conditioner(self, params, x: Array, dim: int) -> Tuple[Array, Array]:
        hidden = [self.hidden_units] * self.n_hidden_layers
        masks = _made_masks(dim, hidden, self.mask_seed)
        h = x
        for i, (layer, mask) in enumerate(zip(params["mlp"], masks)):
            h = jnp.dot(h, layer["w"] * jnp.asarray(mask, h.dtype)) + layer["b"]
            if i < len(masks) - 1:
                h = jax.nn.relu(h)
        shift, log_scale = h[..., :dim], h[..., dim:]
        if self.scale_cap > 0:
            log_scale = self.scale_cap * jnp.tanh(log_scale / self.scale_cap)
        return shift, log_scale

    def inverse_and_log_det(self, params, x: Array) -> Tuple[Array, Array]:
        dim = x.shape[-1]
        shift, log_scale = self._conditioner(params, x, dim)
        z = (x - shift) * jnp.exp(-log_scale)
        return z, -jnp.sum(log_scale, axis=-1)

    def forward_and_log_det(self, params, z: Array) -> Tuple[Array, Array]:
        """Sequential inversion: x_i = z_i * exp(s_i(x_<i)) + t_i(x_<i)."""
        dim = z.shape[-1]

        def body(x, i):
            shift, log_scale = self._conditioner(params, x, dim)
            x_i = z[..., i] * jnp.exp(log_scale[..., i]) + shift[..., i]
            x = x.at[..., i].set(x_i)
            return x, log_scale[..., i]

        x0 = jnp.zeros_like(z)
        x, log_scales = jax.lax.scan(body, x0, jnp.arange(dim))
        return x, jnp.sum(log_scales, axis=0)

    def param_sharding(self, dim: int, model_axis: str):
        from fab_tpu.flows.mlp import mlp_param_sharding

        sizes = [dim] + [self.hidden_units] * self.n_hidden_layers + [2 * dim]
        return {"mlp": list(mlp_param_sharding(sizes, model_axis))}


@dataclasses.dataclass(frozen=True)
class Permutation(Bijector):
    """Fixed random permutation of dims (nflows' RandomPermutation analogue)."""

    seed: int = 0

    def init(self, key: jax.Array, dim: int, dtype=jnp.float32):
        del key, dtype
        return {}

    def _perm(self, dim: int) -> np.ndarray:
        return np.random.RandomState(self.seed).permutation(dim)

    def forward_and_log_det(self, params, z: Array):
        perm = jnp.asarray(self._perm(z.shape[-1]))
        return z[..., perm], jnp.zeros(z.shape[:-1], z.dtype)

    def inverse_and_log_det(self, params, x: Array):
        perm = self._perm(x.shape[-1])
        inv = jnp.asarray(np.argsort(perm))
        return x[..., inv], jnp.zeros(x.shape[:-1], x.dtype)

    def param_sharding(self, dim: int, model_axis: str):
        return {}


def make_masked_affine_maf(
    dim: int, n_layers: int = 5, hidden_units: int = 64
):
    """MAF stack analogue of make_masked_affine_nflows.py."""
    from fab_tpu.flows.base import Flow

    bijectors = []
    for i in range(n_layers):
        bijectors.append(
            MaskedAffineAutoregressive(
                hidden_units=hidden_units, mask_seed=i
            )
        )
        bijectors.append(Permutation(seed=1000 + i))
    return Flow(dim=dim, bijectors=tuple(bijectors))
