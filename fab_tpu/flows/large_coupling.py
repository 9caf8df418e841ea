"""Affine coupling backed by the large-event-dim fused Pallas kernel.

Drop-in replacement for AffineCoupling aimed at LGCP-1600-class shapes (conditioner
weights >> VMEM): on TPU, forward/inverse evaluate fab_tpu/ops/coupling_kernel.py —
one pallas_call per layer with VMEM-resident activations and double-buffered HBM
weight streaming. Everywhere else (CPU tests, odd batch sizes, f64) it falls back to
the mathematically identical jnp path.

Parameter layout matches AffineCoupling except the conditioner's LAST layer is
stored padded to a 128-lane multiple (pad columns are zero at init — the last layer
is zero-initialised anyway — and receive zero gradients, so they stay zero).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from fab_tpu.flows.coupling import AffineCoupling
from fab_tpu.flows.mlp import mlp_apply, mlp_init
from fab_tpu.ops.coupling_kernel import _round128, fused_coupling_apply

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class LargeFusedCoupling(AffineCoupling):
    batch_tile: int = 128
    interpret: bool = False  # run the kernel in interpreter mode (testing)

    def init(self, key: jax.Array, dim: int, dtype=jnp.float32):
        d_cond, d_trans = self._sizes(dim)
        out_pad = _round128(2 * d_trans)
        sizes = [d_cond] + [self.hidden_units] * self.n_hidden_layers + [out_pad]
        return {
            "mlp": mlp_init(
                key, sizes, zero_init_last=True, dtype=dtype,
                init_mode=self.init_mode,
            )
        }

    def _shift_and_log_scale(self, params, x_cond: Array, dim: int):
        # jnp path over the padded last layer; only the first 2*d_trans columns
        # are meaningful.
        _, d_trans = self._sizes(dim)
        h = mlp_apply(params["mlp"], x_cond)
        shift, log_scale = h[..., :d_trans], h[..., d_trans : 2 * d_trans]
        if self.scale_cap > 0.0:
            log_scale = self.scale_cap * jnp.tanh(log_scale / self.scale_cap)
        return shift, log_scale

    def _kernel_ok(self, params, z: Array, dim: int) -> bool:
        if self.n_hidden_layers != 2:
            return False
        if z.ndim != 2 or z.shape[0] % min(self.batch_tile, z.shape[0]) != 0:
            return False
        if z.dtype != jnp.float32:
            return False
        if self.hidden_units % 128 != 0:
            return False
        backend = jax.default_backend()
        return self.interpret or backend == "tpu"

    def _apply_kernel(self, params, z: Array, dim: int, inverse: bool):
        z_cond, z_trans = self._split(z, dim)
        (l1, l2, l3) = params["mlp"]
        y_trans, ld = fused_coupling_apply(
            z_cond, z_trans,
            l1["w"], l1["b"], l2["w"], l2["b"], l3["w"], l3["b"],
            self.scale_cap, inverse, min(self.batch_tile, z.shape[0]),
            self.interpret,
        )
        return self._merge(z_cond, y_trans), ld

    def forward_and_log_det(self, params, z: Array) -> Tuple[Array, Array]:
        dim = z.shape[-1]
        if self._kernel_ok(params, z, dim):
            return self._apply_kernel(params, z, dim, inverse=False)
        return super().forward_and_log_det(params, z)

    def inverse_and_log_det(self, params, x: Array) -> Tuple[Array, Array]:
        dim = x.shape[-1]
        if self._kernel_ok(params, x, dim):
            return self._apply_kernel(params, x, dim, inverse=True)
        return super().inverse_and_log_det(params, x)

    def param_sharding(self, dim: int, model_axis: str):
        d_cond, d_trans = self._sizes(dim)
        out_pad = _round128(2 * d_trans)
        from fab_tpu.flows.mlp import mlp_param_sharding

        sizes = [d_cond] + [self.hidden_units] * self.n_hidden_layers + [out_pad]
        return {"mlp": list(mlp_param_sharding(sizes, model_axis))}
