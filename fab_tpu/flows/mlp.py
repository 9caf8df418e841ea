"""Minimal functional MLP used by coupling-layer conditioners.

Analogue of the reference's conditioner nets (nf.nets.MLP used at
experiments/make_flow/make_normflow_model.py:22 with zero-initialised last layer for an
identity-at-init flow). Pure functions over explicit param pytrees; all layers are
plain matmuls so XLA maps them onto the MXU and fuses the activations.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def mlp_init(
    key: jax.Array,
    sizes: Sequence[int],
    zero_init_last: bool = True,
    dtype=jnp.float32,
    init_mode: str = "he_normal",
):
    """MLP params; last layer zeros if ``zero_init_last``.

    ``init_mode``:
      - ``"he_normal"`` (historic default): W ~ N(0, 2/fan_in), b = 0.
      - ``"torch"``: torch.nn.Linear defaults — the init the reference's
        conditioners get via ``nf.nets.MLP`` (make_normflow_model.py:22):
        kaiming_uniform(a=sqrt(5)) weights, which reduces to
        W ~ U(-1/sqrt(fan_in), +1/sqrt(fan_in)), and
        b ~ U(-1/sqrt(fan_in), +1/sqrt(fan_in)). Weight std is
        1/sqrt(3*fan_in) — ~sqrt(6) ≈ 2.45x SMALLER than he_normal's.
    """
    if init_mode not in ("he_normal", "torch"):
        raise ValueError(f"unknown init_mode {init_mode!r}")
    params = []
    keys = jax.random.split(key, len(sizes) - 1)
    for i, (d_in, d_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        last = i == len(sizes) - 2
        if last and zero_init_last:
            w = jnp.zeros((d_in, d_out), dtype)
            b = jnp.zeros((d_out,), dtype)
        elif init_mode == "torch":
            kw, kb = jax.random.split(keys[i])
            bound = 1.0 / jnp.sqrt(jnp.asarray(d_in, jnp.float32))
            w = jax.random.uniform(
                kw, (d_in, d_out), dtype, minval=-bound, maxval=bound
            )
            b = jax.random.uniform(
                kb, (d_out,), dtype, minval=-bound, maxval=bound
            )
        else:
            w = jax.random.normal(keys[i], (d_in, d_out), dtype) * jnp.sqrt(2.0 / d_in)
            b = jnp.zeros((d_out,), dtype)
        params.append({"w": w, "b": b})
    return params


def mlp_apply(params, x: Array) -> Array:
    """Forward pass; ReLU between layers, linear output."""
    for i, layer in enumerate(params):
        x = jnp.dot(x, layer["w"], preferred_element_type=x.dtype) + layer["b"]
        if i < len(params) - 1:
            x = jax.nn.relu(x)
    return x


def mlp_param_sharding(
    sizes: Sequence[int], model_axis: str
) -> Tuple[dict, ...]:
    """PartitionSpec tree for an MLP: hidden dims sharded over the model axis.

    Megatron-style alternating column/row split: a column-split layer leaves its
    activations sharded over the model axis, the following row-split layer contracts
    over the sharded dim (one psum), so pairs of layers need a single collective.
    Layers left over after the last column/row pair stay replicated.
    """
    from jax.sharding import PartitionSpec as P

    specs = []
    n = len(sizes) - 1
    pending_row = False  # True if previous layer was column-split
    for i in range(n):
        if not pending_row and i + 1 < n:
            specs.append({"w": P(None, model_axis), "b": P(model_axis)})
            pending_row = True
        elif pending_row:
            specs.append({"w": P(model_axis, None), "b": P(None)})
            pending_row = False
        else:
            specs.append({"w": P(None, None), "b": P(None)})
    return tuple(specs)
