"""Device-mesh layer: SPMD sharding of the particle axis (+ optional model axis).

The reference is strictly single-device (SURVEY §2.4); this module is the new
TPU-native runtime layer. Design (BASELINE.json north star):

- A global ("data", "model") mesh. The particle/batch axis of every tensor in the FAB
  pipeline (flow samples, AIS chains, HMC leapfrog states, buffer rows) is sharded
  over "data"; flow params are replicated (or sharded over "model" for very wide
  conditioners via Flow.param_sharding).
- Batches are *generated inside* the compiled step (flow sampling), so SPMD partitioning
  is driven by ``with_sharding_constraint`` hints placed at the batch-creation points
  (see ``constrain_batch``). All cross-particle reductions — ESS, log-Z logsumexp,
  loss softmax, mean p_accept for step-size adaptation, buffer top-k — are plain jnp
  reductions that XLA lowers to psum/all-gather collectives over ICI.

Usage: ``with use_mesh(make_mesh(...)): train...`` — or ``activate_mesh`` for
script-lifetime activation. When no mesh is active all helpers are no-ops, so the same
code runs single-device.
"""
from __future__ import annotations

import contextlib
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

_ACTIVE_MESH: Optional[Mesh] = None


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data", "model") mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    dev_array = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def activate_mesh(mesh: Optional[Mesh]) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


@contextlib.contextmanager
def use_mesh(mesh: Mesh):
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        yield mesh
    finally:
        _ACTIVE_MESH = prev


def data_sharding(*trailing_axes: Optional[str]) -> Optional[NamedSharding]:
    """NamedSharding with leading axis over "data" (None when no mesh active)."""
    if _ACTIVE_MESH is None:
        return None
    return NamedSharding(_ACTIVE_MESH, P(DATA_AXIS, *trailing_axes))


def replicated_sharding() -> Optional[NamedSharding]:
    if _ACTIVE_MESH is None:
        return None
    return NamedSharding(_ACTIVE_MESH, P())


def constrain_batch(x: jax.Array) -> jax.Array:
    """Hint XLA to shard the leading (particle) axis over the data axis.

    No-op when no mesh is active. Placed at batch-creation points (flow base
    sampling, buffer reads) so partitioning propagates through the whole step.
    Under tracing this is a sharding constraint; eagerly it is a device_put.
    """
    if _ACTIVE_MESH is None:
        return x
    if x.ndim == 0 or x.shape[0] % _ACTIVE_MESH.shape[DATA_AXIS] != 0:
        # Oddly-sized batches (plotting, small eval chunks) stay unconstrained
        # rather than erroring; only the hot training batches must divide.
        return x
    spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
    sharding = NamedSharding(_ACTIVE_MESH, spec)
    if isinstance(x, jax.core.Tracer):
        return jax.lax.with_sharding_constraint(x, sharding)
    return jax.device_put(x, sharding)


def constrain_tree_batch(tree):
    """constrain_batch over every array leaf of a pytree."""
    return jax.tree.map(constrain_batch, tree)


def replicate(tree):
    """Device_put a pytree fully-replicated on the active mesh (no-op without)."""
    if _ACTIVE_MESH is None:
        return tree
    return jax.device_put(tree, replicated_sharding())


def shard_flow_params(flow, flow_params):
    """Place flow params on the mesh: model-axis sharded when the mesh has a
    model dimension > 1 (megatron-style specs from flow.param_sharding), else
    replicated. No-op without an active mesh."""
    mesh = _ACTIVE_MESH
    if mesh is None:
        return flow_params
    if mesh.shape.get(MODEL_AXIS, 1) > 1 and hasattr(flow, "param_sharding"):
        specs = flow.param_sharding(MODEL_AXIS)
        shardings = jax.tree.map(
            lambda s: NamedSharding(mesh, s),
            specs,
            is_leaf=lambda x: isinstance(x, P),
        )
        return jax.device_put(flow_params, shardings)
    return jax.device_put(flow_params, replicated_sharding())
