"""LGCP target tests (small grid for speed; 1600-D construction smoke)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fab_tpu.targets import LogGaussianCoxProcess


@pytest.fixture(scope="module")
def lgcp():
    return LogGaussianCoxProcess(grid_size=8)


def test_log_prob_finite_and_batched(lgcp, key):
    x = lgcp.sample_prior(key, 32)
    lp = lgcp.log_prob(x)
    assert lp.shape == (32,)
    assert bool(jnp.all(jnp.isfinite(lp)))


def test_gaussian_prior_term_matches_numpy(lgcp, key):
    """With counts removed, log_prob - log_lik equals the dense-Gaussian density."""
    x = lgcp.sample_prior(key, 4)
    log_lik = jnp.sum(x * lgcp.counts - lgcp.cell_area * jnp.exp(x), -1)
    log_prior = lgcp.log_prob(x) - log_lik
    # numpy reference via cholesky solve
    diff = np.asarray(x, np.float64) - lgcp.mu
    chol = np.asarray(lgcp.chol, np.float64)
    sol = np.linalg.solve(chol, diff.T)
    expected = (
        -0.5 * np.sum(sol**2, 0)
        - np.sum(np.log(np.diag(chol)))
        - 0.5 * lgcp.dim * np.log(2 * np.pi)
    )
    np.testing.assert_allclose(np.asarray(log_prior), expected, rtol=2e-3, atol=2e-2)


def test_grad_is_matmul_form(lgcp, key):
    x = lgcp.sample_prior(key, 2)
    g = jax.grad(lambda xx: jnp.sum(lgcp.log_prob(xx)))(x)
    expected = -(x - lgcp.mu) @ lgcp.k_inv + (
        lgcp.counts - lgcp.cell_area * jnp.exp(x)
    )
    np.testing.assert_allclose(g, expected, rtol=1e-3, atol=1e-3)


def test_counts_deterministic():
    a = LogGaussianCoxProcess(grid_size=8, data_seed=0)
    b = LogGaussianCoxProcess(grid_size=8, data_seed=0)
    np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))


def test_metrics(lgcp, key):
    x = lgcp.sample_prior(key, 64)
    info = lgcp.performance_metrics(x, jnp.zeros(64))
    assert bool(jnp.isfinite(info["post_mean_field_rmse"]))


def test_full_1600d_constructs_and_evaluates(key):
    big = LogGaussianCoxProcess(grid_size=40)
    assert big.dim == 1600
    x = big.sample_prior(key, 4)
    assert bool(jnp.all(jnp.isfinite(big.log_prob(x))))
