"""LGCP target tests (small grid for speed; 1600-D construction smoke).

The target is whitened (flow variable e, field x = mu + L e; see
fab_tpu/targets/lgcp.py) — tests validate the in-graph kernel against the f64
init-time reference and guard the no-large-HLO-literals property that whitening
buys.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fab_tpu.targets import LogGaussianCoxProcess


@pytest.fixture(scope="module")
def lgcp():
    return LogGaussianCoxProcess(grid_size=8)


def test_log_prob_finite_and_batched(lgcp, key):
    e = lgcp.sample_prior(key, 32)
    lp = lgcp.log_prob(e)
    assert lp.shape == (32,)
    assert bool(jnp.all(jnp.isfinite(lp)))


def test_latent_to_field_matches_f64_reference(lgcp, key):
    """The in-graph f32 cholesky agrees with the init-time f64 kernel factor."""
    e = lgcp.sample_prior(key, 4)
    x = np.asarray(lgcp.latent_to_field(e))
    expected = lgcp.mu + np.asarray(e, np.float64) @ lgcp.chol_np.T
    np.testing.assert_allclose(x, expected, rtol=1e-3, atol=1e-3)


def test_log_prob_decomposition(lgcp, key):
    """log p(e) = standard-normal prior + Poisson likelihood of the field."""
    e = lgcp.sample_prior(key, 4)
    x = lgcp.latent_to_field(e)
    log_lik = jnp.sum(x * lgcp.counts - lgcp.cell_area * jnp.exp(x), -1)
    log_prior = lgcp.log_prob(e) - log_lik
    expected = -0.5 * np.sum(np.asarray(e, np.float64) ** 2, -1) - 0.5 * (
        lgcp.dim * np.log(2 * np.pi)
    )
    np.testing.assert_allclose(np.asarray(log_prior), expected, rtol=2e-4, atol=1e-3)


def test_grad_is_matmul_form(lgcp, key):
    """d log p / d e = -e + (y - a exp(x)) @ L."""
    e = lgcp.sample_prior(key, 2)
    g = jax.grad(lambda ee: jnp.sum(lgcp.log_prob(ee)))(e)
    x = lgcp.mu + np.asarray(e, np.float64) @ lgcp.chol_np.T
    resid = np.asarray(lgcp.counts, np.float64) - lgcp.cell_area * np.exp(x)
    expected = -np.asarray(e, np.float64) + resid @ lgcp.chol_np
    np.testing.assert_allclose(np.asarray(g), expected, rtol=2e-3, atol=2e-3)


def test_counts_deterministic():
    a = LogGaussianCoxProcess(grid_size=8, data_seed=0)
    b = LogGaussianCoxProcess(grid_size=8, data_seed=0)
    np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))


def test_metrics(lgcp, key):
    e = lgcp.sample_prior(key, 64)
    info = lgcp.performance_metrics(e, jnp.zeros(64))
    assert bool(jnp.isfinite(info["post_mean_field_rmse"]))


def test_no_large_hlo_literals_in_graph_mode():
    """With in_graph_kernel=True, jitted value+grad of log_prob must not embed
    dense kernel-size literals — the option for transport-size-limited
    environments."""
    t = LogGaussianCoxProcess(grid_size=16, in_graph_kernel=True)
    f = jax.jit(jax.value_and_grad(lambda e: jnp.sum(t.log_prob(e))))
    txt = f.lower(jnp.ones((4, t.dim))).as_text()
    # coords constant [D, 2] is fine; a dense [D, D] literal is not.
    assert len(txt) < 1_000_000, f"HLO unexpectedly large: {len(txt)} bytes"


def test_in_graph_kernel_matches_constant(key):
    """The two kernel backends agree (in-graph f32 cholesky vs f64-at-init)."""
    a = LogGaussianCoxProcess(grid_size=8)
    b = LogGaussianCoxProcess(grid_size=8, in_graph_kernel=True)
    e = a.sample_prior(key, 8)
    np.testing.assert_allclose(
        np.asarray(a.log_prob(e)), np.asarray(b.log_prob(e)), rtol=1e-4, atol=5e-2
    )


def test_full_1600d_constructs_and_evaluates(key):
    big = LogGaussianCoxProcess(grid_size=40)
    assert big.dim == 1600
    e = big.sample_prior(key, 4)
    assert bool(jnp.all(jnp.isfinite(big.log_prob(e))))
