"""Multi-host (pod-slice) runtime initialisation.

The reference is strictly single-process (SURVEY §2.4); fab-tpu scales over TPU pod
slices via jax.distributed: every host runs the same program, `initialize()` wires the
coordinator, and `jax.devices()` then spans the whole slice so the ("data", "model")
mesh (fab_tpu/parallel/mesh.py) covers all chips — collectives ride ICI within the
slice and DCN across slices, inserted by XLA from the sharding annotations.

Host-local concerns:
- checkpointing: only process 0 writes (see ``is_primary``); params/opt-state are
  replicated so a single-host pickle suffices; the buffer is device-sharded but fully
  addressable per host via jax.experimental.multihost_utils when needed.
- logging/eval: gated on ``is_primary``.

On single-host environments every helper is a no-op, so the same entry points run
unchanged from a laptop to a pod slice.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialise jax.distributed when running multi-process; returns True if so.

    Arguments default from the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); on TPU pods jax auto-detects them, so a bare
    ``initialize()`` works there too.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")
    if coordinator_address is None and num_processes is None:
        # Single-process (or TPU auto-detection unavailable): nothing to do.
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def _int_env(name: str) -> Optional[int]:
    val = os.environ.get(name)
    return int(val) if val is not None else None


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0


def n_hosts() -> int:
    return jax.process_count()
