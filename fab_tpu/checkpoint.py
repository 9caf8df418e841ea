"""Checkpoint save/load for param/optimiser/buffer pytrees.

Analogue of the reference's torch.save state_dicts (fab/core.py:222-260,
fab/train.py:37-45, fab/train_with_prioritised_buffer.py:59-68): one file per
checkpoint holding the full training state (flow params, transition-operator
adaptation state, optimiser state, buffer contents, step counter). Arrays are pulled
to host and stored as numpy inside a pickle; load restores plain numpy arrays that JAX
consumes directly (they are re-placed/re-sharded on first use by jit).

Checkpoint directory layout matches the reference (``iter_<n>/state.pkl``) so the
latest-checkpoint resolution logic (fab/utils/training.py:19-33) carries over.
"""
from __future__ import annotations

import os
import pickle
import re
from typing import Any, Optional

import jax
import numpy as np


def save_checkpoint(path: str, state: Any) -> None:
    """Write a pytree checkpoint (host-side numpy pickle)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_state = jax.tree.map(
        lambda a: np.asarray(a) if hasattr(a, "dtype") else a, jax.device_get(state)
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(host_state, f)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


# --------------------------------------------------------------------- orbax
# Multi-host backend (SURVEY §5 "TPU equivalent: orbax-style multi-host checkpoint"):
# every process writes its own shards of distributed arrays; restore re-shards to a
# target pytree of shardings. The pickle backend above stays the default for
# single-host runs (no async machinery, trivially inspectable files).


def save_checkpoint_orbax(path: str, state: Any) -> None:
    """Write a pytree checkpoint with orbax (multi-host safe, sharded arrays)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), state, force=True)


def load_checkpoint_orbax(path: str, target: Any = None) -> Any:
    """Restore an orbax checkpoint. ``target`` (abstract pytree carrying shapes/
    dtypes/shardings, e.g. jax.eval_shape of the train state with shardings
    attached) re-shards arrays onto the current mesh; None restores as numpy."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            return ckptr.restore(os.path.abspath(path), target=target)
        return ckptr.restore(os.path.abspath(path))


def latest_checkpoint(checkpoints_dir: str) -> Optional[str]:
    """Resolve the highest-iteration checkpoint dir (fab/utils/training.py:19-33)."""
    if not os.path.isdir(checkpoints_dir):
        return None
    best, best_iter = None, -1
    for name in os.listdir(checkpoints_dir):
        m = re.fullmatch(r"iter_(\d+)", name)
        if m and int(m.group(1)) > best_iter:
            candidate = os.path.join(checkpoints_dir, name, "state.pkl")
            if os.path.exists(candidate):
                best, best_iter = candidate, int(m.group(1))
    return best
