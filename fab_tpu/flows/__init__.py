from fab_tpu.flows.base import Bijector, DiagGaussianBase, Flow
from fab_tpu.flows.coupling import AffineCoupling
from fab_tpu.flows.factory import data_dependent_init, make_realnvp
from fab_tpu.flows.linear import ActNorm, LULinear

__all__ = [
    "Bijector",
    "DiagGaussianBase",
    "Flow",
    "AffineCoupling",
    "ActNorm",
    "LULinear",
    "make_realnvp",
    "data_dependent_init",
]
