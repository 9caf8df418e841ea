"""Flow factories mirroring the reference's model builders.

``make_realnvp`` is the TPU-native analogue of
experiments/make_flow/make_normflow_model.py:11-30,82-96: n_layers blocks of
[affine coupling (MLP width = dim * layer_nodes_per_dim, zero-init last layer),
invertible LU linear, optional ActNorm], over a trainable diag-Gaussian base.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fab_tpu.flows.base import Bijector, Flow
from fab_tpu.flows.coupling import AffineCoupling
from fab_tpu.flows.linear import ActNorm, LULinear


def make_realnvp(
    dim: int,
    n_flow_layers: int = 5,
    layer_nodes_per_dim: int = 10,
    act_norm: bool = True,
    scale_cap: float = 0.0,
) -> Flow:
    """RealNVP stack: coupling + LU-linear (+ ActNorm) per layer."""
    bijectors: Tuple[Bijector, ...] = ()
    width = dim * layer_nodes_per_dim
    for _ in range(n_flow_layers):
        bijectors += (AffineCoupling(hidden_units=width, scale_cap=scale_cap),)
        bijectors += (LULinear(),)
        if act_norm:
            bijectors += (ActNorm(),)
    return Flow(dim=dim, bijectors=bijectors)


def data_dependent_init(
    flow: Flow,
    params,
    key: jax.Array,
    n_samples: int = 500,
    data: Optional[jnp.ndarray] = None,
):
    """Data-dependent ActNorm initialisation.

    Mirrors the reference's warm-up sample through the flow
    (make_normflow_model.py:95): push a batch forward layer by layer and set each
    ActNorm so its output is standardised per-dimension.
    """
    if data is None:
        z, _ = flow.base.sample_and_log_prob(params["base"], key, n_samples)
    else:
        z = data
    new_layer_params = []
    for bij, p in zip(flow.bijectors, params["layers"]):
        if isinstance(bij, ActNorm):
            mean = jnp.mean(z, axis=0)
            std = jnp.std(z, axis=0) + 1e-6
            log_scale = -jnp.log(std)
            p = {"shift": -mean * jnp.exp(log_scale), "log_scale": log_scale}
        z, _ = bij.forward_and_log_det(p, z)
        new_layer_params.append(p)
    return {"base": params["base"], "layers": tuple(new_layer_params)}
