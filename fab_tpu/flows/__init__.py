from fab_tpu.flows.base import (
    Bijector,
    DiagGaussianBase,
    Flow,
    UniformGaussianBase,
)
from fab_tpu.flows.coupling import AffineCoupling
from fab_tpu.flows.defensive import DefensiveMixture
from fab_tpu.flows.factory import data_dependent_init, make_realnvp
from fab_tpu.flows.autoregressive import (
    MaskedAffineAutoregressive,
    Permutation,
    make_masked_affine_maf,
)
from fab_tpu.flows.fused import FusedRealNVPFlow
from fab_tpu.flows.linear import ActNorm, LULinear
from fab_tpu.flows.resampled import ResampledGaussianBase
from fab_tpu.flows.snf import MetropolisSamplingLayer, StochasticFlow, make_snf_model
from fab_tpu.flows.splines import PeriodicShift, SplineCoupling

__all__ = [
    "Bijector",
    "DiagGaussianBase",
    "UniformGaussianBase",
    "Flow",
    "AffineCoupling",
    "ActNorm",
    "LULinear",
    "SplineCoupling",
    "PeriodicShift",
    "DefensiveMixture",
    "make_realnvp",
    "data_dependent_init",
    "MaskedAffineAutoregressive",
    "Permutation",
    "make_masked_affine_maf",
    "FusedRealNVPFlow",
    "ResampledGaussianBase",
    "MetropolisSamplingLayer",
    "StochasticFlow",
    "make_snf_model",
]
