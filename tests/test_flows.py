"""Flow stack property tests: invertibility, log-det correctness, base-dist parity.

Mirrors the shape-contract tests of fab/wrappers/normflow_test.py:28-34 plus exact
forward/inverse and autodiff-Jacobian checks the reference lacks.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fab_tpu.flows import (
    ActNorm,
    AffineCoupling,
    DiagGaussianBase,
    Flow,
    LULinear,
    data_dependent_init,
    make_realnvp,
)

DIMS = [2, 3, 6]


def _check_bijector(bij, dim, key, atol=1e-5):
    params = bij.init(key, dim)
    z = jax.random.normal(jax.random.fold_in(key, 1), (16, dim))
    x, ld_fwd = bij.forward_and_log_det(params, z)
    z_rec, ld_inv = bij.inverse_and_log_det(params, x)
    np.testing.assert_allclose(z_rec, z, atol=atol, rtol=1e-4)
    np.testing.assert_allclose(ld_fwd, -ld_inv, atol=atol, rtol=1e-4)
    # log-det vs autodiff Jacobian on a single sample.
    jac = jax.jacobian(lambda zz: bij.forward_and_log_det(params, zz[None])[0][0])(
        z[0]
    )
    _, logdet = np.linalg.slogdet(np.asarray(jac))
    np.testing.assert_allclose(ld_fwd[0], logdet, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("dim", DIMS)
def test_affine_coupling(dim, key):
    # Non-zero last layer so the transform is non-trivial: perturb params.
    bij = AffineCoupling(hidden_units=8)
    params = bij.init(key, dim)
    params = jax.tree.map(
        lambda p: p + 0.1 * jax.random.normal(key, p.shape), params
    )
    z = jax.random.normal(jax.random.fold_in(key, 1), (16, dim))
    x, ld = bij.forward_and_log_det(params, z)
    z_rec, ld_inv = bij.inverse_and_log_det(params, x)
    np.testing.assert_allclose(z_rec, z, atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(ld, -ld_inv, atol=1e-6)
    # Identity at (zero) init.
    params0 = bij.init(key, dim)
    x0, ld0 = bij.forward_and_log_det(params0, z)
    np.testing.assert_allclose(x0, z, atol=1e-6)
    np.testing.assert_allclose(ld0, 0.0, atol=1e-6)


@pytest.mark.parametrize("dim", DIMS)
def test_lu_linear(dim, key):
    bij = LULinear()
    _check_bijector(bij, dim, key)
    # Orthogonal init => log-det 0.
    params = bij.init(key, dim)
    z = jax.random.normal(key, (4, dim))
    _, ld = bij.forward_and_log_det(params, z)
    np.testing.assert_allclose(ld, 0.0, atol=1e-4)


def test_actnorm(key):
    bij = ActNorm()
    params = {"shift": jnp.array([1.0, -2.0]), "log_scale": jnp.array([0.3, -0.1])}
    z = jax.random.normal(key, (8, 2))
    x, ld = bij.forward_and_log_det(params, z)
    z_rec, ld_inv = bij.inverse_and_log_det(params, x)
    np.testing.assert_allclose(z_rec, z, atol=1e-6)
    np.testing.assert_allclose(ld, 0.3 - 0.1, atol=1e-6)


def test_diag_gaussian_base(key):
    base = DiagGaussianBase(3)
    params = base.init()
    x, log_prob = base.sample_and_log_prob(params, key, 1000)
    np.testing.assert_allclose(log_prob, base.log_prob(params, x), atol=1e-5)
    # Against scipy formula.
    expected = -0.5 * np.sum(np.asarray(x) ** 2, -1) - 1.5 * np.log(2 * np.pi)
    np.testing.assert_allclose(log_prob, expected, atol=1e-4)


@pytest.mark.parametrize("dim", [2, 6])
def test_realnvp_flow_roundtrip(dim, key):
    flow = make_realnvp(dim, n_flow_layers=3, layer_nodes_per_dim=5, act_norm=True)
    params = flow.init(key)
    # Perturb so couplings are non-trivial.
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(key, p.shape), params
    )
    x, log_q = flow.sample_and_log_prob(params, key, 64)
    assert x.shape == (64, dim) and log_q.shape == (64,)
    log_q2 = flow.log_prob(params, x)
    np.testing.assert_allclose(log_q, log_q2, atol=1e-4, rtol=1e-4)


def test_data_dependent_init(key):
    flow = make_realnvp(4, n_flow_layers=2, layer_nodes_per_dim=4, act_norm=True)
    params = flow.init(key)
    params = data_dependent_init(flow, params, key, n_samples=512)
    x = flow.sample(params, jax.random.fold_in(key, 7), 2048)
    np.testing.assert_allclose(jnp.mean(x, 0), 0.0, atol=0.2)
    np.testing.assert_allclose(jnp.std(x, 0), 1.0, atol=0.2)


def test_flow_log_prob_integrates_to_one(key):
    # 2-D flow: check normalisation by importance sampling against a broad Gaussian.
    flow = make_realnvp(2, n_flow_layers=2, layer_nodes_per_dim=4, act_norm=False)
    params = flow.init(key)
    params = jax.tree.map(
        lambda p: p + 0.1 * jax.random.normal(key, p.shape), params
    )
    z = 4.0 * jax.random.normal(key, (200_000, 2))
    log_ref = -0.5 * jnp.sum((z / 4.0) ** 2, -1) - jnp.log(2 * jnp.pi * 16.0)
    log_q = flow.log_prob(params, z)
    integral = jnp.mean(jnp.exp(log_q - log_ref))
    np.testing.assert_allclose(float(integral), 1.0, atol=0.05)


def test_flow_stays_normalised_under_training(key):
    """Regression: LULinear's sign_s must not drift under the optimiser — drift
    silently unnormalises the flow (log q off by a constant invisible to
    softmax-weighted losses). Train a few steps and check the importance-sampling
    normalisation estimate stays at 1."""
    import optax

    flow = make_realnvp(2, n_flow_layers=4, layer_nodes_per_dim=8, act_norm=False)
    params = flow.init(key)
    target_log_prob = lambda x: -0.5 * jnp.sum((x - 1.0) ** 2, -1) - jnp.log(
        2 * jnp.pi
    )
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, k):
        def loss_fn(p):
            x, log_q = flow.sample_and_log_prob(p, k, 256)
            return jnp.mean(log_q) - jnp.mean(target_log_prob(x))

        grads = jax.grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state

    for i in range(200):
        params, opt_state = step(params, opt_state, jax.random.fold_in(key, i))
    # sign_s unchanged at +-1.
    for layer in params["layers"]:
        if "sign_s" in layer:
            np.testing.assert_allclose(jnp.abs(layer["sign_s"]), 1.0, atol=1e-6)
    # Normalisation: IS against a broad reference density.
    z = 6.0 * jax.random.normal(key, (400_000, 2))
    log_ref = -0.5 * jnp.sum((z / 6.0) ** 2, -1) - jnp.log(2 * jnp.pi * 36.0)
    integral = jnp.mean(jnp.exp(flow.log_prob(params, z) - log_ref))
    np.testing.assert_allclose(float(integral), 1.0, atol=0.1)


def test_torch_init_mode_matches_linear_defaults(key):
    """init_mode='torch' reproduces torch.nn.Linear defaults: W and b both
    U(+-1/sqrt(fan_in)) (kaiming_uniform a=sqrt(5)); std is sqrt(6)x smaller
    than he_normal. Matches the reference conditioners built on torch defaults
    via nf.nets.MLP (make_normflow_model.py:22)."""
    from fab_tpu.flows.mlp import mlp_init

    sizes = [64, 256, 256, 8]
    p_torch = mlp_init(key, sizes, zero_init_last=True, init_mode="torch")
    p_he = mlp_init(key, sizes, zero_init_last=True, init_mode="he_normal")
    for i, (pt, ph) in enumerate(zip(p_torch, p_he)):
        d_in = sizes[i]
        if i == len(sizes) - 2:  # zero-init last layer in both modes
            assert float(jnp.abs(pt["w"]).max()) == 0.0
            continue
        bound = 1.0 / np.sqrt(d_in)
        assert float(jnp.abs(pt["w"]).max()) <= bound
        assert float(jnp.abs(pt["b"]).max()) <= bound
        # Uniform(+-bound) std = bound/sqrt(3); he_normal std = sqrt(2/d_in).
        np.testing.assert_allclose(
            float(jnp.std(pt["w"])), bound / np.sqrt(3.0), rtol=0.05
        )
        ratio = float(jnp.std(ph["w"])) / float(jnp.std(pt["w"]))
        np.testing.assert_allclose(ratio, np.sqrt(6.0), rtol=0.1)
    with pytest.raises(ValueError):
        mlp_init(key, sizes, init_mode="nope")
