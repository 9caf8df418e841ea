"""Wrapper-layer tests: external ecosystems adapted to the Flow API.

Mirrors the reference's wrapper shape-contract test (fab/wrappers/normflow_test.py:
28-34) and extends it: each wrapper must be usable wherever FABModel expects a flow,
and the torch bridge must agree with analytic densities including gradients.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fab_tpu.wrappers import (
    WrappedFlaxFlow,
    WrappedHaikuFlow,
    WrappedJaxDist,
    WrappedTorchDist,
)

DIM = 3


def _analytic_gauss_log_prob(x, loc, scale):
    return jnp.sum(
        -0.5 * ((x - loc) / scale) ** 2 - jnp.log(scale) - 0.5 * jnp.log(2 * jnp.pi),
        axis=-1,
    )


class TestWrappedJaxDist:
    def _make(self):
        loc, scale = 1.5, 2.0
        return WrappedJaxDist.from_callables(
            sample_fn=lambda key, n: loc + scale * jax.random.normal(key, (n, DIM)),
            log_prob_fn=lambda x: _analytic_gauss_log_prob(x, loc, scale),
            dim=DIM,
        )

    def test_shapes_and_consistency(self, key):
        d = self._make()
        params = d.init(key)
        x, log_q = d.sample_and_log_prob(params, key, 64)
        assert x.shape == (64, DIM) and log_q.shape == (64,)
        np.testing.assert_allclose(d.log_prob(params, x), log_q, rtol=1e-5)

    def test_distrax_style_duck_typing(self, key):
        class FakeDistraxDist:
            event_shape = (DIM,)

            def sample(self, seed, sample_shape):
                return jax.random.normal(seed, (*sample_shape, DIM))

            def log_prob(self, x):
                return _analytic_gauss_log_prob(x, 0.0, 1.0)

        d = WrappedJaxDist.wrap(FakeDistraxDist())
        assert d.dim == DIM
        x, log_q = d.sample_and_log_prob(d.init(key), key, 8)
        assert x.shape == (8, DIM) and jnp.all(jnp.isfinite(log_q))


class _AffineFlaxFlow:
    """Built lazily so flax import stays inside the test."""

    def __new__(cls, dim):
        import flax.linen as nn

        class AffineFlow(nn.Module):
            dim: int

            def setup(self):
                self.loc = self.param("loc", nn.initializers.zeros, (self.dim,))
                self.log_scale = self.param(
                    "log_scale", nn.initializers.zeros, (self.dim,)
                )

            def _params(self):
                return self.loc, self.log_scale

            def sample_and_log_prob(self, key, n):
                loc, log_scale = self._params()
                eps = jax.random.normal(key, (n, self.dim))
                x = loc + eps * jnp.exp(log_scale)
                return x, self._lp(x, loc, log_scale)

            def log_prob(self, x):
                loc, log_scale = self._params()
                return self._lp(x, loc, log_scale)

            @staticmethod
            def _lp(x, loc, log_scale):
                return _analytic_gauss_log_prob(x, loc, jnp.exp(log_scale))

        return AffineFlow(dim)


class TestWrappedFlaxFlow:
    def test_contract_and_grads(self, key):
        flow = WrappedFlaxFlow(_AffineFlaxFlow(DIM), DIM)
        params = flow.init(key)
        x, log_q = flow.sample_and_log_prob(params, key, 32)
        assert x.shape == (32, DIM) and log_q.shape == (32,)
        np.testing.assert_allclose(
            flow.log_prob(params, x), log_q, rtol=1e-5, atol=1e-5
        )
        # Trainable: reverse-KL-style objective produces nonzero param grads.
        g = jax.grad(
            lambda p: -jnp.mean(flow.sample_and_log_prob(p, key, 32)[1])
        )(params)
        leaves = jax.tree.leaves(g)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)

    def test_inside_fab_model(self, key):
        from fab_tpu.model import FABModel
        from fab_tpu.sampling import Metropolis
        from fab_tpu.targets import Gaussian

        flow = WrappedFlaxFlow(_AffineFlaxFlow(DIM), DIM)
        target = Gaussian(loc=jnp.ones(DIM), scale=jnp.ones(DIM))
        model = FABModel.create(
            flow,
            target,
            transition_operator=Metropolis(n_ais_intermediate_distributions=2),
            n_intermediate_distributions=2,
            loss_type="fab_alpha_div",
        )
        params = model.init(key)
        loss, (_, info) = model.loss_and_info(params, key, 64)
        assert jnp.isfinite(loss)
        assert int(info["n_valid"]) == 64


class TestWrappedHaikuFlow:
    def _make(self):
        import haiku as hk

        def _modules():
            loc = hk.get_parameter("loc", (DIM,), init=jnp.zeros)
            log_scale = hk.get_parameter("log_scale", (DIM,), init=jnp.zeros)
            return loc, log_scale

        def sample_and_log_prob(key, n):
            loc, log_scale = _modules()
            eps = jax.random.normal(key, (n, DIM))
            x = loc + eps * jnp.exp(log_scale)
            return x, _analytic_gauss_log_prob(x, loc, jnp.exp(log_scale))

        def log_prob(x):
            loc, log_scale = _modules()
            return _analytic_gauss_log_prob(x, loc, jnp.exp(log_scale))

        transformed = hk.multi_transform(
            lambda: (
                sample_and_log_prob,
                {"sample_and_log_prob": sample_and_log_prob, "log_prob": log_prob},
            )
        )
        return WrappedHaikuFlow(transformed, DIM)

    def test_contract_and_shared_params(self, key):
        flow = self._make()
        params = flow.init(key)
        x, log_q = flow.sample_and_log_prob(params, key, 16)
        assert x.shape == (16, DIM)
        np.testing.assert_allclose(
            flow.log_prob(params, x), log_q, rtol=1e-5, atol=1e-5
        )
        g = jax.grad(lambda p: jnp.mean(flow.log_prob(p, x)))(params)
        assert any(float(jnp.abs(l).max()) > 0 for l in jax.tree.leaves(g))


class TestWrappedTorchDist:
    def _make(self):
        import torch

        loc = torch.tensor([0.5, -1.0, 2.0], dtype=torch.float64)
        scale = torch.tensor([1.0, 2.0, 0.5], dtype=torch.float64)
        dist = torch.distributions.Independent(
            torch.distributions.Normal(loc, scale), 1
        )
        return WrappedTorchDist.wrap(dist), np.array([0.5, -1.0, 2.0]), np.array(
            [1.0, 2.0, 0.5]
        )

    def test_log_prob_matches_analytic(self, key):
        d, loc, scale = self._make()
        assert d.dim == DIM
        x = jax.random.normal(key, (10, DIM))
        expected = _analytic_gauss_log_prob(x, jnp.asarray(loc), jnp.asarray(scale))
        np.testing.assert_allclose(d.log_prob({}, x), expected, rtol=1e-5, atol=1e-5)

    def test_grad_matches_analytic(self, key):
        d, loc, scale = self._make()
        x = jax.random.normal(key, (4, DIM))
        got = jax.grad(lambda x: jnp.sum(d.log_prob({}, x)))(x)
        expected = -(x - jnp.asarray(loc)) / jnp.asarray(scale) ** 2
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_sample_deterministic_per_key(self, key):
        d, *_ = self._make()
        x1 = d.sample({}, key, 8)
        x2 = d.sample({}, key, 8)
        x3 = d.sample({}, jax.random.fold_in(key, 1), 8)
        np.testing.assert_array_equal(x1, x2)
        assert not np.allclose(x1, x3)
        assert x1.shape == (8, DIM)

    def test_works_under_jit(self, key):
        d, loc, scale = self._make()

        @jax.jit
        def f(key):
            x, log_q = d.sample_and_log_prob({}, key, 8)
            return x, log_q

        x, log_q = f(key)
        expected = _analytic_gauss_log_prob(x, jnp.asarray(loc), jnp.asarray(scale))
        np.testing.assert_allclose(log_q, expected, rtol=1e-5, atol=1e-5)
