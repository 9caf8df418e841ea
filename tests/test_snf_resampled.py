"""SNF sampling layers + LARS resampled base tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fab_tpu.flows.resampled import ResampledGaussianBase
from fab_tpu.flows.snf import MetropolisSamplingLayer, StochasticFlow, make_snf_model
from fab_tpu.targets import Gaussian


def test_resampled_base_init_is_standard_normal(key):
    base = ResampledGaussianBase(dim=2, hidden_units=8, T=10, n_z_points=256)
    params = base.init()
    z = jax.random.normal(key, (64, 2))
    expected = -0.5 * jnp.sum(z**2, -1) - jnp.log(2 * jnp.pi)
    np.testing.assert_allclose(base.log_prob(params, z), expected, atol=1e-4)


def test_resampled_base_density_integrates_to_one(key):
    """After perturbing the acceptance net, the density must stay normalised
    (checked by importance sampling against the proposal phi)."""
    base = ResampledGaussianBase(dim=2, hidden_units=8, T=50, n_z_points=4096)
    params = base.init()
    params = jax.tree.map(
        lambda p: p + 0.5 * jax.random.normal(key, p.shape), params
    )
    z = jax.random.normal(key, (100_000, 2))
    log_phi = -0.5 * jnp.sum(z**2, -1) - jnp.log(2 * jnp.pi)
    integral = jnp.mean(jnp.exp(base.log_prob(params, z) - log_phi))
    np.testing.assert_allclose(float(integral), 1.0, atol=0.05)


def test_resampled_base_sampling_matches_density(key):
    base = ResampledGaussianBase(dim=1, hidden_units=8, T=100, n_z_points=4096)
    params = base.init()
    # Bias acceptance towards positive z via the last-layer bias on a linear net.
    params = jax.tree.map(lambda p: p + 0.3 * jax.random.normal(key, p.shape), params)
    z, log_p = base.sample_and_log_prob(params, key, 50_000)
    # Empirical mean should match density mean (importance estimate from phi).
    zs = jax.random.normal(jax.random.fold_in(key, 1), (200_000, 1))
    log_phi = -0.5 * jnp.sum(zs**2, -1) - 0.5 * jnp.log(2 * jnp.pi)
    w = jnp.exp(base.log_prob(params, zs) - log_phi)
    mean_density = float(jnp.sum(w * zs[:, 0]) / jnp.sum(w))
    np.testing.assert_allclose(float(jnp.mean(z)), mean_density, atol=0.05)


def test_snf_layer_moves_toward_target(key):
    target = Gaussian(loc=jnp.full((2,), 3.0), scale=jnp.ones(2))
    layer = MetropolisSamplingLayer(
        target_log_prob=target.log_prob, lam=1.0, n_steps=50, proposal_scale=1.0
    )
    z = jax.random.normal(key, (512, 2))
    z_new, delta = layer.forward_and_log_det({}, key, z)
    assert float(jnp.mean(z_new)) > 1.5  # moved toward loc=3
    assert bool(jnp.all(jnp.isfinite(delta)))


def test_snf_single_layer_telescopes_to_ais_identity(key):
    """One detailed-balance MH layer at lam=1 must telescope the importance
    weight to log p(z0) - log q0(z0) (the AIS identity): log_w is exactly
    independent of where the kernel lands. Pins the SNF log-det sign
    (log pi_start - log pi_end, normflows convention); the round-3 inverted
    sign yields 2*log p(x) - log p(z0) - log q0(z0) and fails this test."""
    target = Gaussian(loc=jnp.full((2,), 1.0), scale=jnp.full((2,), 1.5))
    layer = MetropolisSamplingLayer(
        target_log_prob=target.log_prob, lam=1.0, n_steps=20, proposal_scale=0.8
    )
    flow = StochasticFlow(dim=2, layers=(layer,))
    params = flow.init(key)
    n = 4096
    x, log_q = flow.sample_and_log_prob(params, key, n)
    log_w = target.log_prob(x) - log_q
    # Replicate the base draw with the same key split to get z0 exactly.
    key_base, _ = jax.random.split(key)
    z0, log_q0 = flow.base.sample_and_log_prob(params["base"], key_base, n)
    np.testing.assert_allclose(
        np.asarray(log_w),
        np.asarray(target.log_prob(z0) - log_q0),
        rtol=1e-4, atol=1e-4,
    )
    # Unbiasedness: target is normalised, so E_q[w] = 1.
    np.testing.assert_allclose(float(jnp.mean(jnp.exp(log_w))), 1.0, atol=0.1)


def test_snf_model_sample_and_log_prob(key):
    target = Gaussian(loc=jnp.zeros(2), scale=jnp.ones(2))
    flow = make_snf_model(
        2, target.log_prob, n_flow_layers=2, layer_nodes_per_dim=4, it_snf_layer=1,
        mh_steps=3,
    )
    params = flow.init(key)
    x, log_q = flow.sample_and_log_prob(params, key, 64)
    assert x.shape == (64, 2) and bool(jnp.all(jnp.isfinite(log_q)))
    lp = flow.log_prob(params, x, key=key)
    assert bool(jnp.all(jnp.isfinite(lp)))
    # Keyless call RAISES (round-4 verdict: the silent fixed-key fallback is
    # opt-in only); the explicit opt-in still works and is deterministic.
    with pytest.raises(ValueError, match="requires a PRNG key"):
        flow.log_prob(params, x)
    lp2 = flow.log_prob(params, x, allow_fixed_key=True)
    lp3 = flow.log_prob(params, x, allow_fixed_key=True)
    assert bool(jnp.all(jnp.isfinite(lp2)))
    assert bool(jnp.all(lp2 == lp3))
