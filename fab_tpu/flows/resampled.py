"""Resampled (LARS) Gaussian base distribution.

Equivalent of larsflow's ResampledGaussian used for the reference's resampled-base
flows (experiments/make_flow/make_normflow_model.py:131-158, make_aldp_model.py:71-80;
Stimper et al., arXiv:2110.15828 / Bauer & Mnih LARS): a standard normal proposal
phi(z) reshaped by a learned acceptance network a(z) in (0, 1) with T-truncated
rejection sampling. Density:

    p(z) = phi(z) * [ a(z) * (1 - (1-Z)^(T-1)) / Z + (1-Z)^(T-1) ]

where Z = E_phi[a(z)]. The reference estimates Z with a running EMA buffer mutated
during forward passes; functionally we estimate it with a fixed set of N quasi-MC
proposal points stored at init (deterministic, differentiable, no key needed in
log_prob).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from fab_tpu.flows.mlp import mlp_apply, mlp_init

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class ResampledGaussianBase:
    """Drop-in base distribution for Flow (init/sample_and_log_prob/log_prob)."""

    dim: int
    hidden_units: int = 256
    n_hidden_layers: int = 2
    T: int = 100  # truncation: max proposals per sample
    n_z_points: int = 1024  # MC points for the Z estimate
    z_seed: int = 0
    init_mode: str = "he_normal"  # "torch" = torch.nn.Linear defaults (see mlp_init)

    def init(self, dtype=jnp.float32):
        key = jax.random.key(self.z_seed)
        key_net, key_pts = jax.random.split(key)
        sizes = [self.dim] + [self.hidden_units] * self.n_hidden_layers + [1]
        return {
            "accept_net": mlp_init(
                key_net, sizes, zero_init_last=True, dtype=dtype,
                init_mode=self.init_mode,
            ),
            # Fixed proposal points for the normaliser estimate (non-trainable).
            "z_points": jax.random.normal(
                key_pts, (self.n_z_points, self.dim), dtype
            ),
        }

    def _accept_prob(self, params, z: Array) -> Array:
        # Zero-init last layer => a(z) = sigmoid(0) = 1/2 at init: p(z) = phi(z).
        return jax.nn.sigmoid(mlp_apply(params["accept_net"], z)[..., 0])

    def _z_estimate(self, params) -> Array:
        # DOCUMENTED DEVIATION (see PARITY.md): Z is fully detached here. We
        # believe larsflow's ResampledGaussian keeps Z as a buffer updated by
        # EMA (so backprop treats it as a constant), but larsflow's source is
        # not in the reference tree (the reference only imports
        # lf.distributions.ResampledGaussian), so this is an unverified parity
        # claim; detaching drops the -grad(Z)/Z term from grad(log p), leaving
        # the acceptance net's normalisation pressure value-only. The
        # stabilisation evidence is ours and real: without the stop_gradient,
        # the -a(z)(1-tail)/Z^2 gradient term blows up as the acceptance net
        # drives Z small (reverse-KL rsb on GMM-40 reached grad norms ~1e113
        # and died at ~1k iters; with the detach it trains).
        return jax.lax.stop_gradient(
            jnp.mean(self._accept_prob(params, params["z_points"]))
        )

    def _log_phi(self, z: Array) -> Array:
        return -0.5 * jnp.sum(z**2, -1) - 0.5 * self.dim * jnp.log(2 * jnp.pi)

    def log_prob(self, params, z: Array) -> Array:
        a = self._accept_prob(params, z)
        big_z = self._z_estimate(params)
        tail = (1 - big_z) ** (self.T - 1)
        density_ratio = a * (1 - tail) / big_z + tail
        return self._log_phi(z) + jnp.log(density_ratio + 1e-12)

    def sample_and_log_prob(
        self, params, key: jax.Array, n: int
    ) -> Tuple[Array, Array]:
        """T-truncated rejection sampling, vectorised over the batch."""
        from fab_tpu.parallel.mesh import constrain_batch

        def body(carry, key_t):
            z, accepted = carry
            key_prop, key_u = jax.random.split(key_t)
            z_prop = jax.random.normal(key_prop, z.shape, z.dtype)
            a = self._accept_prob(params, z_prop)
            take = (~accepted) & (
                jax.random.uniform(key_u, a.shape, a.dtype) < a
            )
            z = jnp.where(take[:, None], z_prop, z)
            return (z, accepted | take), None

        key_init, key_scan = jax.random.split(key)
        # The T-th proposal is accepted unconditionally (LARS truncation):
        # initialise with a proposal so never-accepted rows keep it.
        z0 = jax.random.normal(key_init, (n, self.dim))
        (z, _), _ = jax.lax.scan(
            body,
            (z0, jnp.zeros(n, bool)),
            jax.random.split(key_scan, self.T - 1),
        )
        z = constrain_batch(jax.lax.stop_gradient(z))
        return z, self.log_prob(params, z)
