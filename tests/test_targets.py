"""Target distribution tests: parity constants, analytic log Z, exact samplers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fab_tpu.targets import GMM, DoubleWellEnergy, Gaussian, ManyWellEnergy
from fab_tpu.utils.numerical import quadratic_function
from fab_tpu.utils.seeding import gmm_mean_draws, quadratic_constants


def test_quadratic_constants_match_torch_global_seed():
    """Our generator-based draws must equal the reference's global-seed draws
    (fab/utils/numerical.py:33-45)."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    x_shift = 2 * torch.randn(2)
    a_mat = 2 * torch.rand((2, 2))
    b_vec = torch.rand(2)
    ours = quadratic_constants(2, 0)
    np.testing.assert_allclose(ours[0], x_shift.numpy(), rtol=1e-6)
    np.testing.assert_allclose(ours[1], a_mat.numpy(), rtol=1e-6)
    np.testing.assert_allclose(ours[2], b_vec.numpy(), rtol=1e-6)


def test_gmm_means_match_torch_global_seed():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    mean = (torch.rand((40, 2)) - 0.5) * 2
    np.testing.assert_allclose(gmm_mean_draws(40, 2, 0), mean.numpy(), rtol=1e-6)


@pytest.fixture(scope="module")
def gmm():
    return GMM(
        dim=2, n_mixes=40, loc_scaling=40.0, log_var_scaling=1.0, seed=0,
        true_expectation_estimation_n_samples=200_000,
    )


def test_gmm_log_prob_matches_mixture_formula(gmm, key):
    x = gmm.sample(key, 100)
    # Direct numpy mixture computation.
    locs, scales = np.asarray(gmm.locs), np.asarray(gmm.scales)
    diffs = np.asarray(x)[:, None, :] - locs
    comp = (
        -0.5 * np.sum((diffs / scales) ** 2, -1)
        - np.sum(np.log(scales), -1)
        - np.log(2 * np.pi)
    )
    expected = np.log(np.mean(np.exp(comp - comp.max(-1, keepdims=True)), -1)) + comp.max(-1)
    np.testing.assert_allclose(gmm.log_prob(x), expected, rtol=1e-4, atol=1e-4)


def test_gmm_low_prob_masked(gmm):
    x = jnp.full((1, 2), 1e4)
    assert bool(jnp.isneginf(gmm.log_prob(x)[0]))


def test_gmm_sample_moments(gmm, key):
    x = gmm.sample(key, 200_000)
    np.testing.assert_allclose(
        jnp.mean(x, 0), jnp.mean(gmm.locs, 0), atol=1.0
    )


def test_gmm_metrics_run(gmm, key):
    samples = gmm.sample(key, 500)
    log_w = jnp.zeros(500)
    info = gmm.performance_metrics(
        samples, log_w, log_q_fn=gmm.log_prob, key=key
    )
    # With q = p, forward KL ~ 0 and ess_over_p ~ 1 (target normalised).
    assert abs(float(info["kl_forward"])) < 0.2
    assert 0.8 < float(info["ess_over_p"]) <= 1.5
    assert float(info["bias_normed"]) < 0.2


def test_double_well_log_z_vs_quadrature():
    """Analytic Z = 11784.50927 (double_well.py:68) against numerical integration."""
    dw = DoubleWellEnergy()
    x1 = np.linspace(-5, 5, 20001)
    z_dim1 = np.trapezoid(np.exp(-(dw._a * x1 + dw._b * x1**2 + dw._c * x1**4)), x1)
    np.testing.assert_allclose(z_dim1, 11784.50927, rtol=1e-5)
    np.testing.assert_allclose(
        dw.log_z_2d, np.log(z_dim1) + 0.5 * np.log(2 * np.pi), rtol=1e-6
    )


def test_double_well_rejection_sampler_histogram(key):
    dw = DoubleWellEnergy()
    samples = jax.jit(lambda k: dw.sample(k, 20000))(key)
    assert samples.shape == (20000, 2)
    assert bool(jnp.all(jnp.isfinite(samples)))
    # Dim-1 mode balance: p(mode at +1.7) / p(mode at -1.7) from the density.
    frac_pos = float(jnp.mean(samples[:, 0] > 0))
    x1 = np.linspace(-5, 5, 20001)
    dens = np.exp(-(dw._a * x1 + dw._b * x1**2 + dw._c * x1**4))
    frac_pos_true = np.trapezoid(dens[x1 > 0], x1[x1 > 0]) / np.trapezoid(dens, x1)
    assert abs(frac_pos - frac_pos_true) < 0.02
    # Dim-2 standard normal.
    np.testing.assert_allclose(float(jnp.std(samples[:, 1])), 1.0, atol=0.05)
    # Sample mean of dim 1 matches density mean.
    mean_true = np.trapezoid(x1 * dens, x1) / np.trapezoid(dens, x1)
    np.testing.assert_allclose(float(jnp.mean(samples[:, 0])), mean_true, atol=0.05)


def test_many_well_log_prob_and_log_z(key):
    mw = ManyWellEnergy(dim=6)
    dw = DoubleWellEnergy()
    x = jax.random.normal(key, (50, 6))
    expected = sum(dw.log_prob(x[:, 2 * i : 2 * i + 2]) for i in range(3))
    np.testing.assert_allclose(mw.log_prob(x), expected, rtol=1e-5)
    np.testing.assert_allclose(mw.log_z, 3 * dw.log_z_2d, rtol=1e-6)


def test_many_well_modes_test_set():
    mw = ManyWellEnergy(dim=6)
    modes = mw.modes_test_set()
    assert modes.shape == (8, 6)
    # Even dims at +-1.7, odd dims at 0.
    assert bool(jnp.all(jnp.abs(jnp.abs(modes[:, 0::2]) - 1.7) < 1e-6))
    assert bool(jnp.all(modes[:, 1::2] == 0))
    # All sign combinations distinct.
    assert len({tuple(np.sign(r[0::2])) for r in np.asarray(modes)}) == 8


def test_many_well_log_z_estimate_consistency(key):
    """AIS-free check of the 50-split log-Z estimator: IS from exact samples with
    self-normalised weights for the unnormalised target should estimate log Z."""
    mw = ManyWellEnergy(dim=4)
    x = mw.sample(key, 5000)
    # log_w for exact samples under unnormalised density: log p_unnorm - log p_true
    # = log Z + noise-free constant => estimator should recover log Z exactly.
    log_w = jnp.full((5000,), mw.log_z)
    info = mw.performance_metrics(x, log_w)
    assert float(info["abs_MSE_log_Z_estimate"]) < 1e-3


def test_many_well_metrics_with_flow(key):
    mw = ManyWellEnergy(dim=4)
    x = mw.sample(key, 500)
    log_w = jnp.zeros(500)
    log_q_fn = lambda y: mw.log_prob(y) - mw.log_z  # perfect "flow"
    info = mw.performance_metrics(
        x, log_w, log_q_fn=log_q_fn, batch_size=250, key=key
    )
    assert abs(float(info["forward_kl"])) < 1e-4


def test_gaussian_target(key):
    g = Gaussian(loc=jnp.zeros(3), scale=jnp.ones(3))
    x = g.sample(key, 1000)
    expected = -0.5 * jnp.sum(x**2, -1) - 1.5 * jnp.log(2 * jnp.pi)
    np.testing.assert_allclose(g.log_prob(x), expected, atol=1e-5)


def test_quadratic_function_matches_reference_formula(key):
    torch = pytest.importorskip("torch")
    x = jax.random.normal(key, (7, 3))
    ours = quadratic_function(x)
    xt = torch.tensor(np.asarray(x))
    torch.manual_seed(0)
    x_shift = 2 * torch.randn(3)
    a = 2 * torch.rand((3, 3))
    b = torch.rand(3)
    xs = xt + x_shift
    theirs = torch.einsum("bi,ij,bj->b", xs, a, xs) + torch.einsum("i,bi->b", b, xs)
    np.testing.assert_allclose(ours, theirs.numpy(), rtol=1e-4, atol=1e-4)


def test_gmm_save_as_numpy(tmp_path):
    import numpy as np

    from fab_tpu.targets import GMM

    target = GMM(dim=2, n_mixes=4, loc_scaling=5.0,
                 true_expectation_estimation_n_samples=1000)
    path = str(tmp_path / "gmm_params.npz")
    target.save_as_numpy(path)
    data = np.load(path)
    assert data["locs"].shape == (4, 2) and data["scales"].shape == (4, 2)
    np.testing.assert_allclose(data["weights"].sum(), 1.0)
