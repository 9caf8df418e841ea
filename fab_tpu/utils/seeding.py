"""Reproduction of the reference's fixed-seed problem constants.

The reference defines its GMM-40 target and the quadratic expectation test function via
torch's global RNG at fixed seeds (fab/target_distributions/gmm.py:22-27,
fab/utils/numerical.py:33-45). To make our metrics (expectation bias, test-set
log-prob) directly comparable, we draw the *same* constants with torch's CPU generator
and cache them as numpy arrays. torch is only used here, at problem-construction time —
never in any compute path. Falls back to numpy RNG (non-parity, flagged) if torch is
unavailable.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np

try:
    import torch  # type: ignore

    _HAVE_TORCH = True
except Exception:  # pragma: no cover
    _HAVE_TORCH = False


@lru_cache(maxsize=None)
def gmm_mean_draws(n_mixes: int, dim: int, seed: int) -> np.ndarray:
    """The uniform(-1, 1) draws for GMM component means at a torch seed.

    fab/target_distributions/gmm.py:22 scales these by ``loc_scaling``; we return the
    raw (rand - 0.5) * 2 draws so callers can scale.
    """
    if _HAVE_TORCH:
        gen = torch.Generator().manual_seed(seed)
        draws = (torch.rand((n_mixes, dim), generator=gen) - 0.5) * 2
        return draws.numpy().astype(np.float64)
    rng = np.random.RandomState(seed)  # pragma: no cover — non-parity fallback
    return (rng.rand(n_mixes, dim) - 0.5) * 2


@lru_cache(maxsize=None)
def quadratic_constants(
    dim: int, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(x_shift, A, b) of the quadratic test function, drawn in the reference's order.

    Order matters for parity: x_shift = 2*randn(dim), then A = 2*rand(dim, dim), then
    b = rand(dim) (fab/utils/numerical.py:33-45).
    """
    if _HAVE_TORCH:
        gen = torch.Generator().manual_seed(seed)
        x_shift = 2 * torch.randn(dim, generator=gen)
        a_mat = 2 * torch.rand((dim, dim), generator=gen)
        b_vec = torch.rand(dim, generator=gen)
        return (
            x_shift.numpy().astype(np.float64),
            a_mat.numpy().astype(np.float64),
            b_vec.numpy().astype(np.float64),
        )
    rng = np.random.RandomState(seed)  # pragma: no cover — non-parity fallback
    return (
        2 * rng.randn(dim),
        2 * rng.rand(dim, dim),
        rng.rand(dim),
    )
