from fab_tpu.targets.base import TargetDistribution
from fab_tpu.targets.double_well import DoubleWellEnergy
from fab_tpu.targets.gaussian import Gaussian
from fab_tpu.targets.gmm import GMM
from fab_tpu.targets.many_well import ManyWellEnergy

__all__ = [
    "TargetDistribution",
    "DoubleWellEnergy",
    "Gaussian",
    "GMM",
    "ManyWellEnergy",
]
from fab_tpu.targets.lgcp import LogGaussianCoxProcess  # noqa: E402

__all__.append("LogGaussianCoxProcess")
