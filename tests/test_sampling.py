"""AIS + transition-operator statistical tests.

Ports the reference's key invariants (fab/sampling_methods/ais_test.py): with
Gaussian q and p, ESS increases and |log-Z error| decreases as the number of
intermediate distributions grows; the alpha-2 divergence has a closed form to sanity
check against. Transition-operator tests use the generic harness pattern of
transition_operators/testing_utils.py:20-82: repeatedly transitioning broad-Gaussian
samples toward a target must move their moments to the target's.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fab_tpu.flows.base import DiagGaussianBase, Flow
from fab_tpu.sampling import (
    AnnealedImportanceSampler,
    HamiltonianMonteCarlo,
    Metropolis,
    beta_schedule,
    create_point,
    intermediate_log_prob,
)
from fab_tpu.targets import Gaussian
from fab_tpu.typing import Point
from fab_tpu.utils.numerical import effective_sample_size


def make_gaussian_flow(dim, loc=0.0, scale=1.0):
    """A 'flow' with no bijectors = trainable diag Gaussian."""
    flow = Flow(dim=dim, bijectors=())
    params = flow.init(jax.random.key(0))
    params["base"]["loc"] = jnp.full((dim,), loc)
    params["base"]["log_scale"] = jnp.full((dim,), jnp.log(scale))
    return flow, params


def analytic_alpha_2_div(mean_q, mean_p):
    """Closed-form alpha-2 divergence for unit-variance Gaussians
    (fab/sampling_methods/ais_test.py:16-18)."""
    return np.exp(np.sum((mean_p - mean_q) ** 2))


# ---------------------------------------------------------------- beta schedules


def test_beta_schedule_linear():
    b = beta_schedule("linear", 4)
    np.testing.assert_allclose(b, np.linspace(0, 1, 6))


def test_beta_schedule_geometric():
    b = beta_schedule("geometric", 16)
    assert b.shape == (18,)
    assert b[0] == 0.0 and b[-1] == 1.0
    assert np.all(np.diff(b) > 0)


def test_beta_schedule_invalid():
    with pytest.raises(ValueError):
        beta_schedule("quadratic", 4)


# ---------------------------------------------------------------- point utils


def test_create_point_grads(key):
    """Gradients populated and correct (fab/sampling_methods/base_test.py:11-23)."""
    log_q_fn = lambda x: -0.5 * jnp.sum(x**2, -1)
    log_p_fn = lambda x: -0.5 * jnp.sum((x - 1.0) ** 2, -1)
    x = jax.random.normal(key, (10, 3))
    pt = create_point(x, log_q_fn, log_p_fn, with_grad=True)
    np.testing.assert_allclose(pt.grad_log_q, -x, atol=1e-5)
    np.testing.assert_allclose(pt.grad_log_p, -(x - 1.0), atol=1e-5)
    pt2 = create_point(x, log_q_fn, log_p_fn, with_grad=False)
    assert pt2.grad_log_q is None


def test_intermediate_log_prob_alpha_forms():
    pt = Point(
        x=jnp.zeros((2, 1)), log_q=jnp.array([1.0, 2.0]), log_p=jnp.array([3.0, 4.0])
    )
    # alpha=1 == plain geometric interpolation toward p.
    np.testing.assert_allclose(
        intermediate_log_prob(pt, 0.5, 1.0), 0.5 * pt.log_q + 0.5 * pt.log_p
    )
    # alpha=2 at beta=1: 2 log_p - log_q (min-var IS distribution p^2/q).
    np.testing.assert_allclose(
        intermediate_log_prob(pt, 1.0, 2.0), 2 * pt.log_p - pt.log_q
    )
    # beta=0 always gives log_q.
    np.testing.assert_allclose(intermediate_log_prob(pt, 0.0, 2.0), pt.log_q)


# ---------------------------------------------------------------- AIS invariants


def _run_ais(n_dists, key, batch_size=1000, p_target=True, hmc=True, dim=2):
    flow, params = make_gaussian_flow(dim, loc=-0.5)
    target = Gaussian(loc=jnp.full((dim,), 0.5), scale=jnp.ones(dim))
    if hmc:
        op = HamiltonianMonteCarlo(
            n_ais_intermediate_distributions=n_dists, n_outer=1, n_leapfrog=5,
            epsilon=1.0,
        )
    else:
        op = Metropolis(n_ais_intermediate_distributions=n_dists, n_updates=3)
    ais = AnnealedImportanceSampler(
        flow=flow,
        target_log_prob=target.log_prob,
        transition_operator=op,
        n_intermediate_distributions=n_dists,
        alpha=2.0,
    )
    state = op.init_state(dim)
    result = jax.jit(
        lambda s, k: ais.sample_and_log_weights(
            params, s, k, batch_size, p_target=p_target, tune=True
        )
    )(state, key)
    return result


def test_ais_ess_improves_with_more_dists(key):
    """ESS up, |log Z error| down with more intermediates (ais_test.py:21-82);
    the target is normalised so true log Z = 0."""
    ess, log_z_err = {}, {}
    for n in [1, 4, 16]:
        result = _run_ais(n, key)
        ess[n] = float(result.info["ess_ais"])
        log_z_err[n] = abs(float(result.info["log_Z"]))
        assert int(result.info["n_valid"]) == 1000
    assert ess[16] > ess[4] > ess[1]
    assert log_z_err[16] < log_z_err[1]
    assert ess[16] > 0.5  # 16 dists on an easy pair should be quite effective
    assert log_z_err[16] < 0.15


def test_ais_base_ess_matches_direct_is(key):
    result = _run_ais(1, key)
    # ess_base should equal direct importance sampling ESS from q to p.
    flow, params = make_gaussian_flow(2, loc=-0.5)
    target = Gaussian(loc=jnp.full((2,), 0.5), scale=jnp.ones(2))
    x, log_q = flow.sample_and_log_prob(params, jax.random.split(key)[0], 1000)
    direct = effective_sample_size(target.log_prob(x) - log_q)
    np.testing.assert_allclose(float(result.info["ess_base"]), float(direct), rtol=1e-4)


def test_ais_min_var_target_log_z(key):
    """With AIS targeting g = p^2/q (alpha=2), log Z_g = log E_q[(p/q)^2] =
    alpha-2-divergence-ish quantity with closed form for Gaussians."""
    result = _run_ais(32, key, p_target=False, batch_size=4000)
    # Z_g = exp(sum (mean_p - mean_q)^2) for unit Gaussians: means +-0.5 in 2-D.
    expected = np.log(analytic_alpha_2_div(np.full(2, -0.5), np.full(2, 0.5)))
    assert abs(float(result.info["log_Z"]) - expected) < 0.5


def test_ais_metropolis_variant(key):
    result = _run_ais(8, key, hmc=False)
    assert float(result.info["ess_ais"]) > float(result.info["ess_base"])
    assert int(result.info["n_valid"]) == 1000


def test_ais_invalid_rows_masked(key):
    """Rows that are non-finite under the target are masked, not propagated."""
    flow, params = make_gaussian_flow(2, loc=0.0, scale=3.0)

    def nasty_log_prob(x):
        # -inf outside a ball: mimics GMM's -1e4 cutoff (gmm.py:57-66).
        lp = -0.5 * jnp.sum(x**2, -1)
        return jnp.where(jnp.sum(x**2, -1) > 4.0, -jnp.inf, lp)

    op = Metropolis(n_ais_intermediate_distributions=2, n_updates=2)
    ais = AnnealedImportanceSampler(
        flow=flow, target_log_prob=nasty_log_prob, transition_operator=op,
        n_intermediate_distributions=2, alpha=2.0,
    )
    result = ais.sample_and_log_weights(
        params, op.init_state(2), key, 512, p_target=True, tune=True
    )
    n_valid = int(result.info["n_valid"])
    assert 0 < n_valid < 512  # some rows must be masked with scale-3 proposals
    assert bool(jnp.isfinite(result.info["ess_ais"]))
    assert bool(jnp.isfinite(result.info["log_Z"]))
    assert bool(jnp.all(jnp.isneginf(result.log_w[~result.mask])))


# ------------------------------------------------------- transition operators


@dataclasses.dataclass
class HarnessTarget:
    """3-mode GMM harness target (testing_utils.py:20-31)."""

    means: jnp.ndarray
    scale: float = 1.0

    def log_prob(self, x):
        comp = -0.5 * jnp.sum(
            ((x[..., None, :] - self.means) / self.scale) ** 2, -1
        ) - x.shape[-1] / 2 * jnp.log(2 * jnp.pi * self.scale**2)
        return jax.scipy.special.logsumexp(comp, axis=-1) - jnp.log(
            self.means.shape[0]
        )


@pytest.mark.parametrize("op_name", ["hmc", "metropolis"])
def test_transition_operator_moves_to_target(op_name, key):
    """Generic driver (testing_utils.py:34-82): repeated transitions at beta=1
    (target = p) must move broad base samples onto the target."""
    dim = 2
    means = jnp.array([[-2.0, 0.0], [2.0, 0.0], [0.0, 2.0]])
    target = HarnessTarget(means)
    flow, params = make_gaussian_flow(dim, loc=0.0, scale=4.0)
    n_dists = 10
    if op_name == "hmc":
        op = HamiltonianMonteCarlo(
            n_ais_intermediate_distributions=n_dists, n_outer=1, n_leapfrog=5,
            epsilon=1.0,
        )
    else:
        op = Metropolis(n_ais_intermediate_distributions=n_dists, n_updates=5)
    state = op.init_state(dim)
    log_q_fn = lambda x: flow.log_prob(params, x)
    x, log_q = flow.sample_and_log_prob(params, key, 2000)
    point = create_point(x, log_q_fn, target.log_prob, op.uses_grad_info)
    mask = jnp.ones(2000, bool)

    @jax.jit
    def sweep(point, state, key):
        for i in range(n_dists):
            key, sub = jax.random.split(key)
            point, state, info = op.transition(
                state, sub, point, jnp.asarray(1.0), jnp.asarray(i), log_q_fn,
                target.log_prob, 1.0, mask, True,
            )
        return point, state, info

    for rep in range(5):
        key, sub = jax.random.split(key)
        point, state, info = sweep(point, state, sub)

    x_final = point.x
    target_mean = jnp.mean(means, 0)
    np.testing.assert_allclose(jnp.mean(x_final, 0), target_mean, atol=0.3)
    # Spread must have contracted from scale 4 toward the mixture's spread (~1.9).
    assert float(jnp.std(x_final)) < 2.5
    # Step-size adaptation moved acceptance toward 0.65.
    assert 0.3 < float(jnp.mean(info["p_accept"])) < 1.0


def test_hmc_step_size_adapts_toward_target_p_accept(key):
    """x1.05 / /1.05 adaptation rule (hmc.py:162-170)."""
    dim = 2
    target = Gaussian(loc=jnp.zeros(dim), scale=jnp.ones(dim))
    flow, params = make_gaussian_flow(dim)
    op = HamiltonianMonteCarlo(
        n_ais_intermediate_distributions=1, epsilon=10.0  # absurdly large
    )
    state = op.init_state(dim)
    log_q_fn = lambda x: flow.log_prob(params, x)
    x, _ = flow.sample_and_log_prob(params, key, 256)
    point = create_point(x, log_q_fn, target.log_prob, True)
    mask = jnp.ones(256, bool)
    eps0 = float(state["epsilons"][0, 0] + state["common_epsilon"])

    @jax.jit
    def step(point, state, key):
        return op.transition(
            state, key, point, jnp.asarray(1.0), jnp.asarray(0), log_q_fn,
            target.log_prob, 1.0, mask, True,
        )

    for i in range(60):
        key, sub = jax.random.split(key)
        point, state, info = step(point, state, sub)
    eps_final = float(state["epsilons"][0, 0] + state["common_epsilon"])
    assert eps_final < eps0 / 3  # adapted downward from absurd step size
    assert float(info["p_accept"][0]) > 0.2  # and acceptance recovered

    # With tune=False the state must not change (eval mode).
    state_before = jax.device_get(state)
    _, state_after, _ = op.transition(
        state, key, point, jnp.asarray(1.0), jnp.asarray(0), log_q_fn,
        target.log_prob, 1.0, mask, False,
    )
    np.testing.assert_allclose(
        state_before["epsilons"], jax.device_get(state_after)["epsilons"]
    )


def test_logw_validity_bound_not_tripped_by_heavy_tails(key):
    """A legitimately heavy-tailed but healthy setting — GMM-40 (40 distant
    modes, -1e4 log-prob cutoff) against an untrained standard-normal flow —
    must never trip the |log_w| < 1e10 validity bound (sampling/ais.py); the
    bound exists for numerically broken rows (LGCP overflow guards), not fat
    tails. The bound's own maskings are surfaced as n_logw_bound_masked."""
    from fab_tpu.targets import GMM

    target = GMM(dim=2, n_mixes=40, loc_scaling=40.0)
    flow, params = make_gaussian_flow(2, loc=0.0, scale=1.0)
    op = Metropolis(n_ais_intermediate_distributions=1, n_updates=1)
    ais = AnnealedImportanceSampler(
        flow=flow, target_log_prob=target.log_prob, transition_operator=op,
        n_intermediate_distributions=1, alpha=2.0,
    )
    result = jax.jit(
        lambda s, k: ais.sample_and_log_weights(params, s, k, 2048)
    )(op.init_state(2), key)
    # log_w magnitudes are huge here (|log p| up to ~1e4 at the cutoff) but far
    # below the 1e10 bound: no row may be masked by the bound itself.
    assert int(result.info["n_logw_bound_masked"]) == 0
    assert int(result.info["n_valid"]) == 2048
    finite_logw = result.log_w[jnp.isfinite(result.log_w)]
    assert float(jnp.max(jnp.abs(finite_logw))) < 1e10


@pytest.mark.parametrize("op_name", ["hmc", "metropolis"])
def test_transition_operators_under_debug_nans(op_name, key):
    """Sanitizer analogue of the reference's anomaly-mode transition tests
    (fab/sampling_methods/transition_operators/hmc_test.py:3 runs under
    torch.autograd.set_detect_anomaly(True)): a healthy transition sweep must
    produce NO NaN anywhere in the compiled program — jax_debug_nans raises at
    the first NaN-producing primitive, including in intermediates that masks
    would later hide."""
    debug_nans_before = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        dim = 2
        means = jnp.array([[-2.0, 0.0], [2.0, 0.0], [0.0, 2.0]])
        target = HarnessTarget(means)
        flow, params = make_gaussian_flow(dim, loc=0.0, scale=2.0)
        n_dists = 3
        if op_name == "hmc":
            op = HamiltonianMonteCarlo(
                n_ais_intermediate_distributions=n_dists, n_outer=1,
                n_leapfrog=5, epsilon=1.0,
            )
        else:
            op = Metropolis(n_ais_intermediate_distributions=n_dists, n_updates=5)
        state = op.init_state(dim)
        log_q_fn = lambda x: flow.log_prob(params, x)
        x, _ = flow.sample_and_log_prob(params, key, 256)
        point = create_point(x, log_q_fn, target.log_prob, op.uses_grad_info)
        mask = jnp.ones(256, bool)
        for i in range(n_dists):
            key, sub = jax.random.split(key)
            point, state, info = op.transition(
                state, sub, point, jnp.asarray(1.0), jnp.asarray(i), log_q_fn,
                target.log_prob, 1.0, mask, True,
            )
        assert bool(jnp.all(jnp.isfinite(point.x)))
        assert bool(jnp.all(jnp.isfinite(info["p_accept"])))
    finally:
        jax.config.update("jax_debug_nans", debug_nans_before)
