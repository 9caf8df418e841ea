"""fab-tpu: TPU-native Flow Annealed Importance Sampling Bootstrap.

Public API mirrors the reference package exports (fab/__init__.py:1-10).
"""
from fab_tpu.buffer import PrioritisedReplayBuffer, ReplayBuffer
from fab_tpu.model import FABModel
from fab_tpu.sampling import (
    AnnealedImportanceSampler,
    HamiltonianMonteCarlo,
    Metropolis,
)
from fab_tpu.train import (
    BufferTrainer,
    PrioritisedBufferTrainer,
    Trainer,
    make_optimizer,
)
from fab_tpu.typing import Point

__version__ = "0.1.0"

__all__ = [
    "FABModel",
    "Trainer",
    "BufferTrainer",
    "PrioritisedBufferTrainer",
    "AnnealedImportanceSampler",
    "HamiltonianMonteCarlo",
    "Metropolis",
    "PrioritisedReplayBuffer",
    "ReplayBuffer",
    "Point",
    "make_optimizer",
]
