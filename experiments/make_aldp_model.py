"""ALDP model factory: circular coupled neural-spline flow over internal coords.

Rework of experiments/make_flow/make_aldp_model.py (reference): n_blocks spline
couplings (hidden 256, 8 bins) alternating which half of the 60-D internal vector is
transformed; circular dims (methyl rotors, phi/psi, ...) use circular splines with a
pi tail bound and enter conditioners through (sin, cos) features; random periodic
shifts between blocks; base distribution uniform on circular dims, Gaussian elsewhere
(gauss-uni, make_aldp_model.py:66-70).
"""
from __future__ import annotations

import os
import sys
from typing import Tuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from fab_tpu.flows.base import Flow, UniformGaussianBase
from fab_tpu.flows.splines import PeriodicShift, SplineCoupling
from fab_tpu.model import FABModel
from fab_tpu.sampling import HamiltonianMonteCarlo, Metropolis
from fab_tpu.targets.aldp import AldpBoltzmann


def make_aldp_flow(
    dim: int,
    circular_dims: Tuple[int, ...],
    n_blocks: int = 12,
    hidden_units: int = 256,
    n_bins: int = 8,
    tail_bound: float = 5.0,
    circ_shift: str = "random",
    seed: int = 0,
    base_type: str = "gauss-uni",
    snf_every: int = 0,
    snf_steps: int = 10,
    snf_proposal_scale: float = 0.1,
    target_log_prob=None,
) -> Flow:
    """base_type: 'gauss-uni' (circular dims uniform, reference
    make_aldp_model.py:66-70), 'gauss' (trainable diagonal Gaussian), or
    'resampled' (LARS base, make_aldp_model.py:71-80). snf_every > 0 inserts a
    Metropolis sampling layer after every snf_every spline blocks (the reference's
    SNF ALDP variant, aldp config 'snf')."""
    d = (dim + 1) // 2
    circ = set(circular_dims)
    rng = np.random.RandomState(seed)
    bijectors = []
    for i in range(n_blocks):
        swap = i % 2 == 1
        if not swap:
            cond_dims = range(0, d)
            trans_dims = range(d, dim)
        else:
            cond_dims = range(d, dim)
            trans_dims = range(0, d)
        bijectors.append(
            SplineCoupling(
                hidden_units=hidden_units,
                n_bins=n_bins,
                tail_bound=tail_bound,
                swap=swap,
                circular_mask=tuple(j in circ for j in trans_dims),
                circular_cond_mask=tuple(j in circ for j in cond_dims),
            )
        )
        if circ_shift == "random" and circular_dims:
            bijectors.append(
                PeriodicShift(
                    circular_dims=tuple(circular_dims),
                    shift=float(rng.uniform(-np.pi, np.pi)),
                )
            )
        if snf_every and (i + 1) % snf_every == 0:
            from fab_tpu.flows.snf import MetropolisSamplingLayer

            assert target_log_prob is not None, "SNF layers need target_log_prob"
            bijectors.append(
                MetropolisSamplingLayer(
                    target_log_prob=target_log_prob,
                    lam=(i + 1) / n_blocks,
                    n_steps=snf_steps,
                    proposal_scale=snf_proposal_scale,
                )
            )
    if base_type == "resampled":
        from fab_tpu.flows.resampled import ResampledGaussianBase

        base = ResampledGaussianBase(dim=dim)
    elif base_type == "gauss":
        from fab_tpu.flows.base import DiagGaussianBase

        base = DiagGaussianBase(dim=dim)
    else:
        base = UniformGaussianBase(dim=dim, circular_dims=tuple(circular_dims))
    if snf_every:
        from fab_tpu.flows.snf import StochasticFlow

        return StochasticFlow(dim=dim, layers=tuple(bijectors), base_dist=base)
    return Flow(dim=dim, bijectors=tuple(bijectors), base_dist=base)


def make_aldp_model(cfg) -> Tuple[FABModel, AldpBoltzmann]:
    """Build target + flow + transition operator + FABModel from an ALDP config
    (mirrors make_aldp_model.py:14-221 / reference fab_buff.yaml schema)."""
    sys_cfg = cfg.system
    target = AldpBoltzmann(
        data_path=cfg.data.get("transform"),
        temperature=sys_cfg.temperature,
        energy_cut=float(sys_cfg.energy_cut),
        energy_max=float(sys_cfg.energy_max),
        n_threads=sys_cfg.get("n_threads", 4),
        transform=sys_cfg.get("transform", "internal"),
        env=sys_cfg.get("env", "vacuum"),
        backend=sys_cfg.get("backend", "jax"),
    )
    snf_cfg = cfg.flow.get("snf")
    flow = make_aldp_flow(
        dim=target.dim,
        circular_dims=target.transform.circular_flow_dims,
        n_blocks=cfg.flow.blocks,
        hidden_units=cfg.flow.hidden_units,
        n_bins=cfg.flow.num_bins,
        circ_shift=cfg.flow.get("circ_shift", "random"),
        seed=cfg.training.seed,
        base_type=cfg.flow.get("base", {}).get("type", "gauss-uni"),
        snf_every=snf_cfg.every if snf_cfg else 0,
        snf_steps=snf_cfg.get("steps", 10) if snf_cfg else 10,
        snf_proposal_scale=snf_cfg.get("proposal_scale", 0.1) if snf_cfg else 0.1,
        target_log_prob=target.log_prob if snf_cfg else None,
    )
    fab_cfg = cfg.fab
    if fab_cfg.get("transition_type", "hmc") == "hmc":
        transition_operator = HamiltonianMonteCarlo(
            n_ais_intermediate_distributions=fab_cfg.n_int_dist,
            n_outer=1,
            n_leapfrog=fab_cfg.n_inner,
            epsilon=fab_cfg.epsilon,
        )
    else:
        transition_operator = Metropolis(
            n_ais_intermediate_distributions=fab_cfg.n_int_dist,
            n_updates=fab_cfg.n_inner,
            max_step_size=fab_cfg.epsilon,
            min_step_size=fab_cfg.epsilon,
        )
    model = FABModel.create(
        flow=flow,
        target=target,
        transition_operator=transition_operator,
        n_intermediate_distributions=fab_cfg.n_int_dist,
        alpha=fab_cfg.get("alpha", 2.0),
        loss_type=fab_cfg.get("loss_type", "fab_alpha_div"),
    )
    # Train-time chirality filter (reference fab_buff.yaml:70 filter_chirality:
    # train; applied at experiments/aldp/train.py:228-243,318-326). D-form AIS /
    # flow samples are masked out before the loss and the buffer-add.
    if cfg.training.get("filter_chirality") == "train":
        import dataclasses

        from fab_tpu.utils.aldp_eval import (
            chirality_scale_shift,
            make_chirality_filter_jax,
        )

        scale, shift = chirality_scale_shift(target.transform)
        model = dataclasses.replace(
            model,
            sample_filter=make_chirality_filter_jax(scale=scale, shift=shift),
        )
    return model, target
