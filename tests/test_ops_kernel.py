"""Fused RealNVP Pallas kernel: correctness vs the jnp twin (interpret mode on CPU).

The kernel is experimental on hardware (see realnvp_kernel.py docstring); these tests
pin the math so the kernel stays correct while the Mosaic issue is chased.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import fab_tpu.ops.realnvp_kernel as rk
from fab_tpu.flows import make_realnvp
from fab_tpu.flows.fused import FusedRealNVPFlow, _reference_pass, _stack_params


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


@pytest.mark.parametrize("inverse", [True, False])
def test_kernel_matches_reference(inverse, key):
    flow = make_realnvp(8, n_flow_layers=3, layer_nodes_per_dim=4, act_norm=False)
    params = flow.init(key)
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(key, p.shape), params
    )
    x = jax.random.normal(jax.random.fold_in(key, 1), (64, 8))
    s = _stack_params(params, inverse=inverse)
    z_ref, ld_ref = _reference_pass(s, x, inverse)
    z_k, ld_k = rk.fused_realnvp_pass(
        x, s["w1"], s["b1"], s["w2"], s["b2"], s["w3"], s["b3"], s["wlin"],
        s["lu_ld"], inverse=inverse, tile_b=32,
    )
    np.testing.assert_allclose(z_k, z_ref, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(ld_k, ld_ref, atol=1e-5, rtol=1e-5)


def test_reference_pass_matches_flow(key):
    """The jnp twin must equal the real Flow implementation."""
    flow = make_realnvp(6, n_flow_layers=2, layer_nodes_per_dim=4, act_norm=False)
    params = flow.init(key)
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(key, p.shape), params
    )
    x = jax.random.normal(key, (32, 6))
    s = _stack_params(params, inverse=True)
    z_tw, ld_tw = _reference_pass(s, x, True)
    z_fl, ld_fl = flow.inverse_and_log_det(params, x)
    np.testing.assert_allclose(z_tw, z_fl, atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(ld_tw, ld_fl, atol=1e-5, rtol=1e-4)


def test_fused_flow_falls_back_off_tpu(key):
    """On CPU the FusedRealNVPFlow must transparently use the jnp path."""
    fused = make_realnvp(
        6, n_flow_layers=2, layer_nodes_per_dim=4, act_norm=False, fused=True
    )
    assert isinstance(fused, FusedRealNVPFlow)
    params = fused.init(key)
    x, log_q = fused.sample_and_log_prob(params, key, 16)
    np.testing.assert_allclose(log_q, fused.log_prob(params, x), atol=1e-5)


# ------------------------------------------------- large-dim streamed kernel


def test_large_fused_coupling_matches_jnp(key):
    """LargeFusedCoupling (interpret-mode kernel) == its own jnp fallback, for
    forward and inverse incl. log-dets, at an LGCP-like (scaled-down) shape."""
    import dataclasses as dc

    from fab_tpu.flows.large_coupling import LargeFusedCoupling

    dim, width, batch = 256, 512, 128
    layer_k = LargeFusedCoupling(
        hidden_units=width, scale_cap=5.0, interpret=True, batch_tile=64
    )
    layer_j = dc.replace(layer_k, interpret=False)  # jnp fallback path on CPU
    params = layer_k.init(key, dim)
    # padded last layer: zero-init, 128-multiple width
    assert params["mlp"][-1]["w"].shape[-1] % 128 == 0
    z = jax.random.normal(jax.random.fold_in(key, 1), (batch, dim))
    # perturb the zero last layer so the transform is non-trivial
    params["mlp"][-1]["w"] = (
        0.01 * jax.random.normal(jax.random.fold_in(key, 2),
                                 params["mlp"][-1]["w"].shape)
    )
    y_k, ld_k = layer_k.forward_and_log_det(params, z)
    y_j, ld_j = layer_j.forward_and_log_det(params, z)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_j), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ld_k), np.asarray(ld_j), atol=2e-4)
    x_k, ldi_k = layer_k.inverse_and_log_det(params, y_k)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(z), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ldi_k), -np.asarray(ld_k), atol=2e-4)


def test_large_fused_coupling_grads_match(key):
    """Custom-VJP gradients of the kernel path == jnp-path gradients."""
    import dataclasses as dc

    from fab_tpu.flows.large_coupling import LargeFusedCoupling

    dim, width, batch = 256, 512, 64
    layer_k = LargeFusedCoupling(
        hidden_units=width, scale_cap=5.0, interpret=True, batch_tile=64
    )
    layer_j = dc.replace(layer_k, interpret=False)
    params = layer_k.init(key, dim)
    params["mlp"][-1]["w"] = (
        0.01 * jax.random.normal(jax.random.fold_in(key, 2),
                                 params["mlp"][-1]["w"].shape)
    )
    z = jax.random.normal(jax.random.fold_in(key, 1), (batch, dim))

    def loss(layer, p, z):
        y, ld = layer.forward_and_log_det(p, z)
        return jnp.sum(y**2) + jnp.sum(ld)

    g_k = jax.grad(lambda p: loss(layer_k, p, z))(params)
    g_j = jax.grad(lambda p: loss(layer_j, p, z))(params)
    for a, b in zip(jax.tree.leaves(g_k), jax.tree.leaves(g_j)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    gz_k = jax.grad(lambda z: loss(layer_k, params, z))(z)
    gz_j = jax.grad(lambda z: loss(layer_j, params, z))(z)
    np.testing.assert_allclose(np.asarray(gz_k), np.asarray(gz_j), atol=5e-4)
