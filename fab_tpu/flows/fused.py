"""FusedRealNVPFlow: Flow variant backed by the fused Pallas kernel on TPU.

Drop-in replacement for a [AffineCoupling(2 hidden layers), LULinear] x L Flow:
forward/inverse passes run as ONE pallas kernel (fab_tpu/ops/realnvp_kernel.py) with
all weights VMEM-resident; gradients come from a custom VJP whose backward re-traces
the same math as a jnp graph (cotangents agree with the unfused path). Falls back to
the plain jnp path off-TPU or for batch shapes that don't tile.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from fab_tpu.flows.base import Flow
from fab_tpu.flows.coupling import AffineCoupling
from fab_tpu.flows.linear import LULinear, _lu_pieces

Array = jnp.ndarray


def _stack_params(params, inverse: bool):
    """Per-layer param dicts -> stacked arrays for the kernel."""
    couplings = params["layers"][0::2]
    lus = params["layers"][1::2]
    w1 = jnp.stack([c["mlp"][0]["w"] for c in couplings])
    b1 = jnp.stack([c["mlp"][0]["b"] for c in couplings])
    w2 = jnp.stack([c["mlp"][1]["w"] for c in couplings])
    b2 = jnp.stack([c["mlp"][1]["b"] for c in couplings])
    w3 = jnp.stack([c["mlp"][2]["w"] for c in couplings])
    b3 = jnp.stack([c["mlp"][2]["b"] for c in couplings])
    wlins, lu_lds = [], []
    for lu in lus:
        l_mat, u_mat = _lu_pieces(lu)
        w = jnp.dot(l_mat, u_mat, preferred_element_type=l_mat.dtype)
        if inverse:
            eye = jnp.eye(w.shape[0], dtype=w.dtype)
            l_inv = jax.scipy.linalg.solve_triangular(l_mat, eye, lower=True)
            w = jax.scipy.linalg.solve_triangular(u_mat, l_inv, lower=False)
        wlins.append(w)
        lu_lds.append(jnp.sum(lu["log_s"])[None])
    return {
        "w1": w1, "b1": b1, "w2": w2, "b2": b2, "w3": w3, "b3": b3,
        "wlin": jnp.stack(wlins), "lu_ld": jnp.stack(lu_lds),
    }


def _reference_pass(stacked, x: Array, inverse: bool) -> Tuple[Array, Array]:
    """Pure-jnp twin of the kernel math (used for the custom-VJP backward)."""
    L, d_cond, _ = stacked["w1"].shape
    d_trans = x.shape[-1] - d_cond
    z = x
    ld = jnp.zeros(x.shape[:-1], x.dtype)

    def coupling(z, l, ld):
        zc, zt = z[:, :d_cond], z[:, d_cond:]
        h = jax.nn.relu(jnp.dot(zc, stacked["w1"][l]) + stacked["b1"][l])
        h = jax.nn.relu(jnp.dot(h, stacked["w2"][l]) + stacked["b2"][l])
        o = jnp.dot(h, stacked["w3"][l]) + stacked["b3"][l]
        shift, log_scale = o[:, :d_trans], o[:, d_trans:]
        if inverse:
            zt = (zt - shift) * jnp.exp(-log_scale)
            ld = ld - jnp.sum(log_scale, -1)
        else:
            zt = zt * jnp.exp(log_scale) + shift
            ld = ld + jnp.sum(log_scale, -1)
        return jnp.concatenate([zc, zt], -1), ld

    if inverse:
        for l in range(L - 1, -1, -1):
            z = jnp.dot(z, stacked["wlin"][l].T)
            ld = ld - stacked["lu_ld"][l, 0]
            z, ld = coupling(z, l, ld)
    else:
        for l in range(L):
            z, ld = coupling(z, l, ld)
            z = jnp.dot(z, stacked["wlin"][l].T)
            ld = ld + stacked["lu_ld"][l, 0]
    return z, ld


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_pass(stacked, x, inverse: bool, tile_b: int):
    from fab_tpu.ops.realnvp_kernel import fused_realnvp_pass

    return fused_realnvp_pass(
        x,
        stacked["w1"], stacked["b1"], stacked["w2"], stacked["b2"],
        stacked["w3"], stacked["b3"], stacked["wlin"], stacked["lu_ld"],
        inverse=inverse,
        tile_b=tile_b,
    )


def _fused_fwd(stacked, x, inverse, tile_b):
    out = _fused_pass(stacked, x, inverse, tile_b)
    return out, (stacked, x)


def _fused_bwd(inverse, tile_b, residual, cotangents):
    stacked, x = residual
    _, vjp_fn = jax.vjp(lambda s, xx: _reference_pass(s, xx, inverse), stacked, x)
    return vjp_fn(cotangents)


_fused_pass.defvjp(_fused_fwd, _fused_bwd)


def _tile_for(batch: int, want: int) -> int:
    tile = min(want, batch)
    while batch % tile != 0:
        tile //= 2
    return max(tile, 1)


@dataclasses.dataclass(frozen=True)
class FusedRealNVPFlow(Flow):
    """Flow with fused pallas forward/inverse on TPU (jnp fallback elsewhere)."""

    tile_b: int = 512

    def _fusable(self, x: Array) -> bool:
        if jax.default_backend() != "tpu":
            return False
        # Structure: strictly alternating coupling (2 hidden layers) / LU.
        if len(self.bijectors) % 2 != 0:
            return False
        for i, b in enumerate(self.bijectors):
            if i % 2 == 0 and not (
                isinstance(b, AffineCoupling)
                and b.n_hidden_layers == 2
                and not b.swap
                and b.scale_cap == 0.0
            ):
                return False
            if i % 2 == 1 and not isinstance(b, LULinear):
                return False
        return x.ndim == 2

    def forward_and_log_det(self, params, z: Array):
        if not self._fusable(z):
            return super().forward_and_log_det(params, z)
        stacked = _stack_params(params, inverse=False)
        return _fused_pass(stacked, z, False, _tile_for(z.shape[0], self.tile_b))

    def inverse_and_log_det(self, params, x: Array):
        if not self._fusable(x):
            return super().inverse_and_log_det(params, x)
        stacked = _stack_params(params, inverse=True)
        return _fused_pass(stacked, x, True, _tile_for(x.shape[0], self.tile_b))
