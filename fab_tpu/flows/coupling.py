"""Affine coupling bijector with an MLP conditioner.

TPU-native equivalent of the reference RealNVP layer
(nf.flows.AffineCouplingBlock(param_map, scale_map="exp") built at
experiments/make_flow/make_normflow_model.py:11-30): split x = (x1[:d], x2[d:]),
d = ceil(dim/2); the conditioner MLP [d, width, width, 2*(dim-d)] (zero-init last
layer, so the flow starts at identity) produces (shift, log_scale) and
y2 = x2 * exp(log_scale) + shift. All ops are matmuls + elementwise, which XLA fuses;
see fab_tpu/ops/realnvp_kernel.py for the fused Pallas path used for large event dims.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from fab_tpu.flows.base import Bijector
from fab_tpu.flows.mlp import mlp_apply, mlp_init, mlp_param_sharding

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class AffineCoupling(Bijector):
    """y1 = x1; y2 = x2 * exp(s(x1)) + t(x1).

    ``swap=True`` transforms the *first* block conditioned on the second instead, so
    stacked layers can alternate which half is updated even without a mixing layer.
    ``scale_cap`` tanh-bounds log-scale for numerical robustness (the reference relies
    on exp directly; an unbounded exp is the main source of early-training NaNs that
    the reference then filters — fab/sampling_methods/ais.py:190-213).
    """

    hidden_units: int
    n_hidden_layers: int = 2
    swap: bool = False
    scale_cap: float = 0.0  # 0 = uncapped (reference behaviour: plain exp)
    init_mode: str = "he_normal"  # "torch" = torch.nn.Linear defaults (see mlp_init)

    def _sizes(self, dim: int):
        d = (dim + 1) // 2  # ceil(dim/2), matching make_normflow_model.py:21
        d_cond, d_trans = (dim - d, d) if self.swap else (d, dim - d)
        return d_cond, d_trans

    def init(self, key: jax.Array, dim: int, dtype=jnp.float32):
        d_cond, d_trans = self._sizes(dim)
        sizes = (
            [d_cond] + [self.hidden_units] * self.n_hidden_layers + [2 * d_trans]
        )
        return {
            "mlp": mlp_init(
                key, sizes, zero_init_last=True, dtype=dtype,
                init_mode=self.init_mode,
            )
        }

    def _split(self, x: Array, dim: int) -> Tuple[Array, Array]:
        d = (dim + 1) // 2
        if self.swap:
            return x[..., d:], x[..., :d]
        return x[..., :d], x[..., d:]

    def _merge(self, x_cond: Array, y_trans: Array) -> Array:
        if self.swap:
            return jnp.concatenate([y_trans, x_cond], axis=-1)
        return jnp.concatenate([x_cond, y_trans], axis=-1)

    def _shift_and_log_scale(self, params, x_cond: Array, dim: int):
        _, d_trans = self._sizes(dim)
        h = mlp_apply(params["mlp"], x_cond)
        shift, log_scale = h[..., :d_trans], h[..., d_trans:]
        if self.scale_cap > 0.0:
            log_scale = self.scale_cap * jnp.tanh(log_scale / self.scale_cap)
        return shift, log_scale

    def forward_and_log_det(self, params, z: Array) -> Tuple[Array, Array]:
        dim = z.shape[-1]
        z_cond, z_trans = self._split(z, dim)
        shift, log_scale = self._shift_and_log_scale(params, z_cond, dim)
        y_trans = z_trans * jnp.exp(log_scale) + shift
        return self._merge(z_cond, y_trans), jnp.sum(log_scale, axis=-1)

    def inverse_and_log_det(self, params, x: Array) -> Tuple[Array, Array]:
        dim = x.shape[-1]
        x_cond, x_trans = self._split(x, dim)
        shift, log_scale = self._shift_and_log_scale(params, x_cond, dim)
        z_trans = (x_trans - shift) * jnp.exp(-log_scale)
        return self._merge(x_cond, z_trans), -jnp.sum(log_scale, axis=-1)

    def param_sharding(self, dim: int, model_axis: str):
        d_cond, d_trans = self._sizes(dim)
        sizes = (
            [d_cond] + [self.hidden_units] * self.n_hidden_layers + [2 * d_trans]
        )
        return {"mlp": list(mlp_param_sharding(sizes, model_axis))}
