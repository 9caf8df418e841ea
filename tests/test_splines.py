"""Rational-quadratic spline tests: invertibility, log-det, tails, circularity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fab_tpu.flows.splines import SplineCoupling, rational_quadratic_spline


def _random_spline_params(key, shape, k, circular):
    k1, k2, k3 = jax.random.split(key, 3)
    rw = jax.random.normal(k1, shape + (k,))
    rh = jax.random.normal(k2, shape + (k,))
    rd = jax.random.normal(k3, shape + (k if circular else k - 1,))
    return rw, rh, rd


@pytest.mark.parametrize("circular", [False, True])
def test_spline_roundtrip(circular, key):
    k = 8
    tb = float(jnp.pi) if circular else 3.0
    rw, rh, rd = _random_spline_params(key, (256,), k, circular)
    x = jax.random.uniform(key, (256,), minval=-tb, maxval=tb)
    y, ld = rational_quadratic_spline(x, rw, rh, rd, False, tb, circular)
    x_rec, ld_inv = rational_quadratic_spline(y, rw, rh, rd, True, tb, circular)
    np.testing.assert_allclose(x_rec, x, atol=5e-4)
    np.testing.assert_allclose(ld, -ld_inv, atol=2e-3)
    assert bool(jnp.all((y >= -tb) & (y <= tb)))


def test_spline_logdet_vs_finite_difference(key):
    k = 6
    rw, rh, rd = _random_spline_params(key, (), k, False)
    f = lambda x: rational_quadratic_spline(x, rw, rh, rd, False, 3.0)[0]
    xs = jnp.linspace(-2.5, 2.5, 41)
    for x in xs:
        grad = jax.grad(f)(x)
        _, ld = rational_quadratic_spline(x, rw, rh, rd, False, 3.0)
        np.testing.assert_allclose(jnp.log(grad), ld, atol=1e-4)


def test_spline_identity_tails(key):
    k = 5
    rw, rh, rd = _random_spline_params(key, (10,), k, False)
    x = jnp.linspace(4.0, 10.0, 10)  # outside [-3, 3]
    y, ld = rational_quadratic_spline(x, rw, rh, rd, False, 3.0)
    np.testing.assert_allclose(y, x)
    np.testing.assert_allclose(ld, 0.0)


def test_spline_monotone(key):
    k = 8
    rw, rh, rd = _random_spline_params(key, (), k, False)
    xs = jnp.linspace(-3.0, 3.0, 500)
    ys, _ = rational_quadratic_spline(
        xs, jnp.tile(rw, (500, 1)), jnp.tile(rh, (500, 1)), jnp.tile(rd, (500, 1)),
        False, 3.0,
    )
    assert bool(jnp.all(jnp.diff(ys) > 0))


def test_spline_coupling_bijector(key):
    dim = 6
    bij = SplineCoupling(hidden_units=16, n_bins=6, tail_bound=4.0)
    params = bij.init(key, dim)
    params = jax.tree.map(
        lambda p: p + 0.2 * jax.random.normal(key, p.shape), params
    )
    z = jax.random.normal(jax.random.fold_in(key, 1), (64, dim))
    x, ld = bij.forward_and_log_det(params, z)
    z_rec, ld_inv = bij.inverse_and_log_det(params, x)
    # f32 roundtrip error amplifies as 1/f' in near-flat spline regions (the
    # transform is exact in f64 — see test_spline_coupling_exact_in_f64).
    np.testing.assert_allclose(z_rec, z, atol=2e-2)
    np.testing.assert_allclose(ld, -ld_inv, atol=2e-2)
    # Log-det vs autodiff Jacobian.
    jac = jax.jacobian(lambda zz: bij.forward_and_log_det(params, zz[None])[0][0])(
        z[0]
    )
    _, logdet = np.linalg.slogdet(np.asarray(jac))
    np.testing.assert_allclose(ld[0], logdet, atol=1e-3)
    # Identity at zero-init.
    params0 = bij.init(key, dim)
    x0, ld0 = bij.forward_and_log_det(params0, z)
    np.testing.assert_allclose(ld0, 0.0, atol=1e-4)


def test_spline_coupling_circular_mask(key):
    dim = 4  # 2 conditioned, 2 transformed; second transformed dim circular
    bij = SplineCoupling(
        hidden_units=8, n_bins=5, tail_bound=3.0, circular_mask=(False, True)
    )
    params = bij.init(key, dim)
    params = jax.tree.map(
        lambda p: p + 0.3 * jax.random.normal(key, p.shape), params
    )
    z = jax.random.uniform(key, (128, dim), minval=-3.0, maxval=3.0)
    # Circular dim input must lie within [-pi, pi] for the circular spline.
    z = z.at[:, 3].set(jnp.clip(z[:, 3], -3.1, 3.1) / 3.1 * jnp.pi * 0.999)
    x, ld = bij.forward_and_log_det(params, z)
    z_rec, ld_inv = bij.inverse_and_log_det(params, x)
    np.testing.assert_allclose(z_rec, z, atol=1e-4)
    # Circular output stays in [-pi, pi].
    assert bool(jnp.all(jnp.abs(x[:, 3]) <= jnp.pi + 1e-5))


def test_spline_coupling_exact_in_f64(key):
    """The transform is mathematically exact — f32 roundtrip error is precision
    only. Run the same roundtrip in f64 and require ~1e-10."""
    import subprocess, sys, os

    # x64 must be enabled before jax runs anything; use a fresh process.
    code = (
        "import jax; jax.config.update('jax_enable_x64', True);\n"
        "import jax.numpy as jnp, sys; sys.path.insert(0, '/root/repo')\n"
        "from fab_tpu.flows.splines import SplineCoupling\n"
        "key = jax.random.key(0)\n"
        "bij = SplineCoupling(hidden_units=16, n_bins=6, tail_bound=4.0)\n"
        "params = bij.init(key, 6, dtype=jnp.float64)\n"
        "params = jax.tree.map(lambda p: p + 0.2*jax.random.normal(key, p.shape, jnp.float64), params)\n"
        "z = jax.random.normal(jax.random.fold_in(key,1), (64, 6), jnp.float64)\n"
        "x, ld = bij.forward_and_log_det(params, z)\n"
        "z_rec, ld_inv = bij.inverse_and_log_det(params, x)\n"
        "assert float(jnp.max(jnp.abs(z_rec - z))) < 1e-9\n"
        "assert float(jnp.max(jnp.abs(ld + ld_inv))) < 1e-9\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    result = subprocess.run([sys.executable, "-c", code], env=env,
                            capture_output=True, text=True, timeout=120)
    assert result.returncode == 0, result.stderr[-2000:]
