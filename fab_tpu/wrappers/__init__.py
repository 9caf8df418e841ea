"""Wrappers: adapt external model/distribution ecosystems to the fab-tpu Flow API.

TPU-native counterpart of the reference's L1 wrapper layer (fab/wrappers/ —
normflows.py:8-31, nflow.py:8-31, torch.py:7-23), which adapted external torch flow
libraries to its ``Distribution`` protocol. Here the protocol is the functional Flow
surface consumed by FABModel (fab_tpu/flows/base.py): ``init(key, dtype)``,
``sample_and_log_prob(params, key, n)``, ``log_prob(params, x)``, ``dim``.

- ``WrappedJaxDist``     — any stateless JAX distribution object (distrax/TFP-style
                           ``sample(seed=..., sample_shape=...)`` + ``log_prob``) or a
                           pair of pure callables. Zero trainable params.
- ``WrappedFlaxFlow``    — a flax.linen Module exposing ``sample_and_log_prob`` /
                           ``log_prob`` methods (trainable).
- ``WrappedHaikuFlow``   — a haiku ``multi_transform`` with the same two entry points
                           (trainable).
- ``WrappedTorchDist``   — a torch.distributions.Distribution bridged through
                           ``jax.pure_callback`` with torch-autograd VJPs; the
                           counterpart of the reference's test/base-dist wrapper
                           (fab/wrappers/torch.py:7-23). Host-side; for parity checks
                           and as an AIS base in tests, not a TPU compute path.

The reference's flowtorch wrapper (fab/wrappers/flowtorch.py:10-13) is a broken stub
referencing an undefined name; it has intentionally no counterpart here.
"""
from fab_tpu.wrappers.jax_dist import WrappedJaxDist
from fab_tpu.wrappers.flax_module import WrappedFlaxFlow
from fab_tpu.wrappers.haiku_module import WrappedHaikuFlow
from fab_tpu.wrappers.torch_dist import WrappedTorchDist

__all__ = [
    "WrappedJaxDist",
    "WrappedFlaxFlow",
    "WrappedHaikuFlow",
    "WrappedTorchDist",
]
