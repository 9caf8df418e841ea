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
    fused: bool = False,
    fused_coupling: bool = False,
    init_mode: str = "he_normal",
) -> Flow:
    """RealNVP stack: coupling + LU-linear (+ ActNorm) per layer.

    ``fused=True`` returns a FusedRealNVPFlow whose whole forward/inverse pass runs
    as one Pallas kernel on TPU (small dims only; weights must fit VMEM).
    ``fused_coupling=True`` swaps each coupling layer for LargeFusedCoupling — the
    per-layer streamed kernel for LARGE event dims (LGCP-1600 class) where the
    conditioner weights exceed VMEM (fab_tpu/ops/coupling_kernel.py).
    """
    bijectors: Tuple[Bijector, ...] = ()
    width = dim * layer_nodes_per_dim
    for _ in range(n_flow_layers):
        if fused_coupling:
            from fab_tpu.flows.large_coupling import LargeFusedCoupling

            bijectors += (
                LargeFusedCoupling(
                    hidden_units=width, scale_cap=scale_cap, init_mode=init_mode
                ),
            )
        else:
            bijectors += (
                AffineCoupling(
                    hidden_units=width, scale_cap=scale_cap, init_mode=init_mode
                ),
            )
        bijectors += (LULinear(),)
        if act_norm:
            bijectors += (ActNorm(),)
    if fused:
        from fab_tpu.flows.fused import FusedRealNVPFlow

        assert not act_norm and scale_cap == 0.0, (
            "fused RealNVP requires the plain coupling+LU structure"
        )
        return FusedRealNVPFlow(dim=dim, bijectors=bijectors)
    return Flow(dim=dim, bijectors=bijectors)


def make_resampled_realnvp(
    dim: int,
    n_flow_layers: int = 5,
    layer_nodes_per_dim: int = 10,
    act_norm: bool = True,
    a_hidden_units: int = 256,
    a_hidden_layers: int = 2,
    T: int = 100,
    init_mode: str = "he_normal",
) -> Flow:
    """RealNVP over a LARS resampled-Gaussian base
    (make_normflow_model.py:131-158)."""
    from fab_tpu.flows.resampled import ResampledGaussianBase

    flow = make_realnvp(
        dim,
        n_flow_layers=n_flow_layers,
        layer_nodes_per_dim=layer_nodes_per_dim,
        act_norm=act_norm,
        init_mode=init_mode,
    )
    base = ResampledGaussianBase(
        dim=dim, hidden_units=a_hidden_units, n_hidden_layers=a_hidden_layers, T=T,
        init_mode=init_mode,
    )
    return Flow(dim=dim, bijectors=flow.bijectors, base_dist=base)


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
