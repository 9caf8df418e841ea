from fab_tpu.sampling.ais import AISResult, AnnealedImportanceSampler
from fab_tpu.sampling.hmc import HamiltonianMonteCarlo
from fab_tpu.sampling.metropolis import Metropolis
from fab_tpu.sampling.point import (
    create_point,
    grad_intermediate_log_prob,
    intermediate_log_prob,
    resample,
)
from fab_tpu.sampling.rejection import rejection_sampling
from fab_tpu.sampling.schedules import beta_schedule

__all__ = [
    "AISResult",
    "AnnealedImportanceSampler",
    "HamiltonianMonteCarlo",
    "Metropolis",
    "create_point",
    "grad_intermediate_log_prob",
    "intermediate_log_prob",
    "resample",
    "rejection_sampling",
    "beta_schedule",
]
