"""Many-Well target: product of D/2 independent 2-D double wells.

Rework of fab/target_distributions/many_well.py:16-147. The log-prob sums the 2-D
double-well density over consecutive coordinate pairs (vectorised over wells instead of
the reference's Python loop, many_well.py:81-90); analytic log Z = (D/2) * log_Z_2D
(many_well.py:52-58); the mode test set is the 2^(D/2) grid of well centres at +-1.7
for D < 40, else random sign draws (many_well.py:26-37,68-79).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fab_tpu.targets.base import LogProbFn, TargetDistribution
from fab_tpu.targets.double_well import DoubleWellEnergy

Array = jnp.ndarray


class ManyWellEnergy(TargetDistribution):
    MAX_DIM_FOR_ALL_MODES = 40

    def __init__(self, dim: int = 32, a=-0.5, b=-6.0, c=1.0, normalised: bool = False):
        assert dim % 2 == 0
        self.dim = dim
        self.n_wells = dim // 2
        self.double_well = DoubleWellEnergy(a, b, c)
        self.centre = 1.7
        self.normalised = normalised
        if dim < self.MAX_DIM_FOR_ALL_MODES:
            # All 2^(D/2) sign combinations of the well centres on even dims.
            signs = np.array(
                np.meshgrid(*[[-self.centre, self.centre]] * self.n_wells)
            ).T.reshape(-1, self.n_wells)
            test_set = np.zeros((signs.shape[0], dim))
            test_set[:, 0::2] = signs
            self._test_set_modes = jnp.asarray(test_set, jnp.float32)
        else:
            self._test_set_modes = None

    @property
    def log_z(self) -> float:
        return self.double_well.log_z_2d * self.n_wells

    def log_prob(self, x: Array) -> Array:
        pairs = x.reshape(x.shape[:-1] + (self.n_wells, 2))
        log_prob = -jnp.sum(self.double_well.energy(pairs), axis=-1)
        if self.normalised:
            return log_prob - self.log_z
        return log_prob

    def log_prob_2d(self, x: Array) -> Array:
        """Per-well marginal, for plotting (many_well.py:92-94)."""
        return self.double_well.log_prob(x)

    def sample(self, key: jax.Array, n: int) -> Array:
        keys = jax.random.split(key, self.n_wells)
        wells = [self.double_well.sample(k, n) for k in keys]
        return jnp.concatenate(wells, axis=-1)

    def modes_test_set(self, key: Optional[jax.Array] = None, n: int = 10_000) -> Array:
        """Points placed at each mode (many_well.py:68-79)."""
        if self._test_set_modes is not None:
            return self._test_set_modes
        assert key is not None
        signs = jax.random.randint(key, (n, self.n_wells), 0, 2) * 2 - 1
        test_set = jnp.zeros((n, self.dim))
        return test_set.at[:, 0::2].set(signs * self.centre)

    def performance_metrics(
        self,
        samples: Array,
        log_w: Array,
        log_q_fn: Optional[LogProbFn] = None,
        batch_size: Optional[int] = None,
        mask: Optional[Array] = None,
        key: Optional[jax.Array] = None,
    ) -> Dict[str, Array]:
        """log-Z estimation error over 50 splits + test-set log-probs / forward KL.

        Matches many_well.py:96-147: the log-w vector is carved into 50 interleaved
        estimates of N/50 samples each (chunk j contributes its i-th element to
        estimate i), and the mean absolute (relative) log-Z error across the 50
        estimates is reported. Invalid rows (mask=False) get weight -inf, matching the
        reference's row dropping in expectation (the estimator sees fewer effective
        samples).
        """
        del samples
        n_runs = 50
        if mask is not None:
            log_w = jnp.where(mask, log_w, -jnp.inf)
        n_per_split = log_w.shape[0] // n_runs
        # [n_runs, n_per_split]: element [i, j] = log_w[j * n_runs + i].
        lw = log_w[: n_per_split * n_runs].reshape(n_per_split, n_runs).T
        log_z_estimate = jax.scipy.special.logsumexp(lw, axis=-1) - jnp.log(
            n_per_split
        )
        relative_error = jnp.exp(log_z_estimate - self.log_z) - 1
        info = {
            "relative_MSE_Z_estimate": jnp.mean(jnp.abs(relative_error)),
            "abs_MSE_log_Z_estimate": jnp.mean(jnp.abs(log_z_estimate - self.log_z)),
        }
        if log_q_fn is not None:
            assert key is not None
            key_modes, key_exact = jax.random.split(key)
            n_exact = log_w.shape[0] if batch_size is None else batch_size
            modes = self.modes_test_set(key_modes)
            x_exact = self.sample(key_exact, n_exact)
            log_q_exact = log_q_fn(x_exact)
            info.update(
                test_set_modes_mean_log_prob=jnp.mean(log_q_fn(modes)),
                test_set_exact_mean_log_prob=jnp.mean(log_q_exact),
                forward_kl=jnp.mean(
                    self.log_prob(x_exact) - self.log_z - log_q_exact
                ),
            )
        return info
