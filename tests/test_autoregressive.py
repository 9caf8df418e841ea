"""MAF bijector tests: autoregressive property, invertibility, log-det."""
import jax
import jax.numpy as jnp
import numpy as np

from fab_tpu.flows.autoregressive import (
    MaskedAffineAutoregressive,
    Permutation,
    make_masked_affine_maf,
)


def test_autoregressive_property(key):
    """Output i of the conditioner must not depend on inputs >= i."""
    dim = 5
    bij = MaskedAffineAutoregressive(hidden_units=16)
    params = bij.init(key, dim)
    params = jax.tree.map(lambda p: p + 0.1 * jax.random.normal(key, p.shape), params)
    x = jax.random.normal(key, (1, dim))
    shift, _ = bij._conditioner(params, x, dim)
    jac = jax.jacobian(lambda xx: bij._conditioner(params, xx[None], dim)[0][0])(x[0])
    # Strictly lower-triangular dependence.
    assert np.allclose(np.triu(np.asarray(jac)), 0.0, atol=1e-6)


def test_maf_roundtrip(key):
    dim = 4
    bij = MaskedAffineAutoregressive(hidden_units=16)
    params = bij.init(key, dim)
    params = jax.tree.map(lambda p: p + 0.2 * jax.random.normal(key, p.shape), params)
    z = jax.random.normal(key, (32, dim))
    x, ld = bij.forward_and_log_det(params, z)
    z_rec, ld_inv = bij.inverse_and_log_det(params, x)
    np.testing.assert_allclose(z_rec, z, atol=1e-4)
    np.testing.assert_allclose(ld, -ld_inv, atol=1e-4)


def test_permutation_roundtrip(key):
    bij = Permutation(seed=3)
    z = jax.random.normal(key, (8, 6))
    x, ld = bij.forward_and_log_det({}, z)
    z_rec, _ = bij.inverse_and_log_det({}, x)
    np.testing.assert_allclose(z_rec, z)
    np.testing.assert_allclose(ld, 0.0)


def test_maf_flow(key):
    flow = make_masked_affine_maf(4, n_layers=2, hidden_units=16)
    params = flow.init(key)
    params = jax.tree.map(lambda p: p + 0.1 * jax.random.normal(key, p.shape), params)
    x, log_q = flow.sample_and_log_prob(params, key, 64)
    log_q2 = flow.log_prob(params, x)
    np.testing.assert_allclose(log_q, log_q2, atol=1e-3, rtol=1e-4)
