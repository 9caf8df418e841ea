"""Stochastic normalizing flow (SNF): MCMC sampling layers inside the flow.

Equivalent of the reference's SNF variant (experiments/make_flow/
make_normflow_model.py:33-79,99-128): RealNVP blocks interleaved with
Metropolis-Hastings sampling layers targeting the linear interpolation
log pi_lambda = lambda * log p_target + (1 - lambda) * log N(0, I), lambda ramping
with depth. Per Wu/Koehler/Noe (arXiv:2002.06707), a detailed-balance kernel at
stationary pi makes the effective log q gain +(log pi(end) - log pi(start)) of
each kernel run (normflows' MetropolisHastings accumulates the same as
log_det = log_pi_old - log_pi_new), keeping the importance weights unbiased:
one lam=1 layer telescopes log_w to the AIS identity log p(z0) - log q0(z0).

Deviations (documented): the interpolation base is a fixed standard normal (the
reference interpolates against its trainable DiagGaussian base); log_prob without an
explicit key uses a fixed internal key (the reference uses torch's global RNG there).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from fab_tpu.flows.base import Bijector, DiagGaussianBase, Flow

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class MetropolisSamplingLayer:
    """MH sampling layer at interpolation weight lam (stochastic, keyed)."""

    target_log_prob: Callable[[Array], Array]
    lam: float
    n_steps: int = 10
    proposal_scale: float = 0.1

    is_stochastic: bool = dataclasses.field(default=True, init=False, repr=False)

    def init(self, key: jax.Array, dim: int, dtype=jnp.float32):
        del key, dim, dtype
        return {}

    def _log_pi(self, x: Array) -> Array:
        log_base = -0.5 * jnp.sum(x**2, -1) - 0.5 * x.shape[-1] * jnp.log(
            2 * jnp.pi
        )
        return self.lam * self.target_log_prob(x) + (1 - self.lam) * log_base

    def _mcmc(self, key: jax.Array, x: Array) -> Tuple[Array, Array]:
        log_pi_start = self._log_pi(x)

        def step(carry, key_t):
            x, log_pi_x = carry
            key_prop, key_acc = jax.random.split(key_t)
            x_prop = x + self.proposal_scale * jax.random.normal(
                key_prop, x.shape, x.dtype
            )
            log_pi_prop = self._log_pi(x_prop)
            accept_prob = jnp.exp(log_pi_prop - log_pi_x)
            accept_prob = jnp.nan_to_num(accept_prob, nan=0.0, posinf=1.0)
            accept = accept_prob > jax.random.uniform(
                key_acc, accept_prob.shape, accept_prob.dtype
            )
            x = jnp.where(accept[:, None], x_prop, x)
            log_pi_x = jnp.where(accept, log_pi_prop, log_pi_x)
            return (x, log_pi_x), None

        (x, log_pi_end), _ = jax.lax.scan(
            step, (x, log_pi_start), jax.random.split(key, self.n_steps)
        )
        # SNF log-det convention (Wu/Koehler/Noe; normflows MetropolisHastings
        # accumulates log_det = log_pi_old - log_pi_new): return
        # log pi(start) - log pi(end). sample_and_log_prob consumes it as
        # log_q -= ld, so the effective log q GAINS +(log pi_end - log pi_start),
        # which makes a single lam=1 layer telescope the importance weight to
        # log p(z0) - log q0(z0) (AIS identity) — see
        # tests/test_snf_resampled.py::test_snf_single_layer_telescopes_to_ais_identity.
        # (Round-3 had the sign inverted, biasing log_q by 2x the ratio and
        # mis-directing reverse-KL training — the documented SNF divergence.)
        return x, log_pi_start - log_pi_end

    def forward_and_log_det(self, params, key: jax.Array, z: Array):
        """Sampling direction: returns log pi(z) - log pi(z') (see _mcmc).

        NO stop_gradient here: like the reference's torch MCMC flow layers,
        pathwise gradients flow through the where()-selected positions (the
        discrete accept decision itself is non-differentiable in both). Cutting
        them (as an earlier revision did) severs the log p(z_final) pullback on
        upstream couplings, whose only remaining incentive is to maximise their
        log-det — observed as unbounded expansion (|z| 17 -> 2e3 within ~13
        reverse-KL steps on GMM-40) and permanent divergence.
        """
        del params
        return self._mcmc(key, z)

    def inverse_and_log_det(self, params, key: jax.Array, x: Array):
        """Density direction: the kernel is its own reversal (detailed balance)."""
        del params
        return self._mcmc(key, x)

    def param_sharding(self, dim: int, model_axis: str):
        return {}


@dataclasses.dataclass(frozen=True)
class StochasticFlow:
    """Flow whose chain may contain stochastic sampling layers.

    Same Distribution API as Flow, but log_prob/sample accept an optional key for
    the MCMC noise (fixed internal key when omitted, keeping the FABModel API).
    """

    dim: int
    layers: Tuple[Any, ...]  # Bijector | MetropolisSamplingLayer
    base_dist: Any = None  # DiagGaussianBase | UniformGaussianBase | resampled

    # Marks this flow as needing a PRNG key for log_prob — consumed by
    # fab_tpu.flows.base.flow_log_prob, which every in-repo log_prob call site
    # routes through.
    is_stochastic = True

    @property
    def base(self):
        return self.base_dist if self.base_dist is not None else DiagGaussianBase(
            self.dim
        )

    @property
    def event_shape(self) -> Tuple[int, ...]:
        return (self.dim,)

    def init(self, key: jax.Array, dtype=jnp.float32):
        keys = jax.random.split(key, max(len(self.layers), 1))
        return {
            "base": self.base.init(dtype),
            "layers": tuple(
                layer.init(k, self.dim, dtype)
                for layer, k in zip(self.layers, keys)
            ),
        }

    def sample_and_log_prob(self, params, key: jax.Array, n: int):
        # NOTE: tests/test_snf_resampled.py::test_snf_single_layer_telescopes_to_
        # ais_identity reconstructs the base draw by replicating this exact split
        # order (jax.random.split(key)[0] -> base). If you change the split
        # discipline here, update that test in lockstep — a mismatch there is a
        # key-derivation change, not a correctness regression.
        key_base, key_layers = jax.random.split(key)
        z, log_q = self.base.sample_and_log_prob(params["base"], key_base, n)
        for i, (layer, p) in enumerate(zip(self.layers, params["layers"])):
            if getattr(layer, "is_stochastic", False):
                z, ld = layer.forward_and_log_det(
                    p, jax.random.fold_in(key_layers, i), z
                )
            else:
                z, ld = layer.forward_and_log_det(p, z)
            log_q = log_q - ld
        return z, log_q

    def sample(self, params, key: jax.Array, n: int):
        return self.sample_and_log_prob(params, key, n)[0]

    def log_prob(
        self, params, x: Array, key: jax.Array = None, *, allow_fixed_key: bool = False
    ) -> Array:
        if key is None:
            if not allow_fixed_key:
                raise ValueError(
                    "SNF log_prob requires a PRNG key: the stochastic MH layers "
                    "draw fresh noise per call (reference: normflows MH layers "
                    "consume torch global RNG). Pass key=, or opt into the "
                    "deterministic biased fallback with allow_fixed_key=True."
                )
            key = jax.random.key(0)
        log_det = jnp.zeros(x.shape[:-1], x.dtype)
        for i, (layer, p) in enumerate(
            zip(reversed(self.layers), reversed(params["layers"]))
        ):
            if getattr(layer, "is_stochastic", False):
                x, ld = layer.inverse_and_log_det(p, jax.random.fold_in(key, i), x)
            else:
                x, ld = layer.inverse_and_log_det(p, x)
            log_det = log_det + ld
        return self.base.log_prob(params["base"], x) + log_det

    def param_sharding(self, model_axis: str = "model"):
        from jax.sharding import PartitionSpec as P

        return {
            "base": jax.tree.map(lambda _: P(), self.base.init()),
            "layers": tuple(
                layer.param_sharding(self.dim, model_axis) for layer in self.layers
            ),
        }


def make_snf_model(
    dim: int,
    target_log_prob: Callable[[Array], Array],
    n_flow_layers: int = 5,
    layer_nodes_per_dim: int = 10,
    act_norm: bool = False,
    it_snf_layer: int = 2,
    mh_prop_scale: float = 0.1,
    mh_steps: int = 10,
    init_mode: str = "he_normal",
) -> StochasticFlow:
    """SNF stack mirroring make_normflow_snf (make_normflow_model.py:33-79):
    every ``it_snf_layer`` RealNVP blocks, insert an MH sampling layer at
    lam = (i+1)/n_flow_layers."""
    from fab_tpu.flows.coupling import AffineCoupling
    from fab_tpu.flows.linear import ActNorm, LULinear

    width = dim * layer_nodes_per_dim
    layers: Tuple[Any, ...] = ()
    for i in range(n_flow_layers):
        layers += (AffineCoupling(hidden_units=width, init_mode=init_mode),)
        layers += (LULinear(),)
        if act_norm:
            layers += (ActNorm(),)
        if (i + 1) % it_snf_layer == 0:
            lam = (i + 1) / n_flow_layers
            layers += (
                MetropolisSamplingLayer(
                    target_log_prob=target_log_prob,
                    lam=lam,
                    n_steps=mh_steps,
                    proposal_scale=mh_prop_scale,
                ),
            )
    return StochasticFlow(dim=dim, layers=layers)
