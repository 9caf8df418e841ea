"""2-D double-well Boltzmann target with exact sampling.

Rework of fab/target_distributions/double_well.py:31-103: energy
E(x) = a*x1 + b*x1^2 + c*x1^4 + 0.5*x2^2; for the canonical (a, b, c) =
(-0.5, -6, 1) parameters, dimension 1 is sampled exactly by rejection sampling under a
two-component Gaussian-mixture envelope with Z = 11784.50927 and k = 3Z
(double_well.py:60-83), dimension 2 is standard normal.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from fab_tpu.sampling.rejection import rejection_sampling
from fab_tpu.targets.base import TargetDistribution

Array = jnp.ndarray

# Normalising constant of exp(-E) along dim 1 for (a, b, c) = (-0.5, -6, 1)
# (double_well.py:68).
DW_Z_DIM1 = 11784.50927


class DoubleWellEnergy(TargetDistribution):
    def __init__(self, a: float = -0.5, b: float = -6.0, c: float = 1.0):
        self.dim = 2
        self._a = a
        self._b = b
        self._c = c
        self._canonical = a == -0.5 and b == -6.0 and c == 1.0

    def energy_dim_1(self, x1: Array) -> Array:
        return self._a * x1 + self._b * x1**2 + self._c * x1**4

    def energy_dim_2(self, x2: Array) -> Array:
        return 0.5 * x2**2

    def energy(self, x: Array) -> Array:
        return self.energy_dim_1(x[..., 0]) + self.energy_dim_2(x[..., 1])

    def log_prob(self, x: Array) -> Array:
        return -self.energy(x)

    @property
    def log_z_2d(self) -> float:
        """Analytic log Z (double_well.py:96-103)."""
        assert self._canonical
        import numpy as np

        return float(np.log(DW_Z_DIM1) + 0.5 * np.log(2 * np.pi))

    def _proposal_log_prob(self, x1: Array) -> Array:
        """Two-component Gaussian-mixture envelope (double_well.py:70-75)."""
        log_comp = jnp.stack(
            [
                jnp.log(0.2) - 0.5 * ((x1 + 1.7) / 0.5) ** 2,
                jnp.log(0.8) - 0.5 * ((x1 - 1.7) / 0.5) ** 2,
            ],
            axis=-1,
        ) - (0.5 * jnp.log(2 * jnp.pi) + jnp.log(0.5))
        return jax.scipy.special.logsumexp(log_comp, axis=-1)

    def _proposal_sample(self, key: jax.Array, n: int) -> Array:
        key_c, key_e = jax.random.split(key)
        comp = jax.random.bernoulli(key_c, 0.8, (n,))  # True -> mean +1.7
        mean = jnp.where(comp, 1.7, -1.7)
        return mean + 0.5 * jax.random.normal(key_e, (n,))

    def sample_first_dimension(self, key: jax.Array, n: int) -> Array:
        assert self._canonical
        # Unnormalised target along dim 1 (double_well.py:65-66): note the reference
        # uses -E with the canonical constants folded in.
        def target_log_prob(x):
            return -(x**4) + 6 * x**2 + 0.5 * x

        return rejection_sampling(
            key,
            n,
            self._proposal_sample,
            self._proposal_log_prob,
            target_log_prob,
            k=DW_Z_DIM1 * 3,
        )

    def sample(self, key: jax.Array, n: int) -> Array:
        key1, key2 = jax.random.split(key)
        x1 = self.sample_first_dimension(key1, n)
        x2 = jax.random.normal(key2, (n,))
        return jnp.stack([x1, x2], axis=-1)
