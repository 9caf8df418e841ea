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
