"""Config loading + checkpoint-dir resolution + dataset iteration.

Rework of fab/utils/training.py:8-52 and setup_run.py:130-148. Configs are plain YAML
loaded into an attribute-accessible nested namespace (no hydra dependency in this
image; CLI overrides are handled by the experiment entry points).
"""
from __future__ import annotations

import glob
import os
from typing import Any, Dict, Iterator, Optional

import numpy as np
import yaml


class ConfigDict(dict):
    """dict with attribute access, recursively (omegaconf-lite)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @classmethod
    def from_nested(cls, data: Dict) -> "ConfigDict":
        out = cls()
        for k, v in data.items():
            out[k] = cls.from_nested(v) if isinstance(v, dict) else v
        return out


def maybe_enable_x64(cfg: ConfigDict):
    """Enable f64 if the config asks for it; return the compute dtype.

    The reference trains every paper config in double precision
    (experiments/config/gmm.yaml `use_64_bit: true`, many_well.yaml:41; the ALDP
    script defaults torch to double, experiments/aldp/train.py). Call this BEFORE
    constructing targets/models so every constant is created at the right width.
    On TPU, f64 is XLA-emulated — slower but exact; small FAB flows are
    dispatch-latency-bound so the cost is modest (measured in BASELINE.md).
    """
    import jax
    import jax.numpy as jnp

    if cfg.get("training") and cfg.training.get("use_64_bit"):
        jax.config.update("jax_enable_x64", True)
        return jnp.float64
    return jnp.float32


def load_config(path: str) -> ConfigDict:
    """Load a YAML config (fab/utils/training.py:8-16)."""
    with open(path) as f:
        return ConfigDict.from_nested(yaml.safe_load(f))


def apply_overrides(cfg: ConfigDict, overrides) -> ConfigDict:
    """Apply dotted-path overrides like training.seed=1 (hydra-style CLI)."""
    for override in overrides or []:
        path, value = override.split("=", 1)
        node = cfg
        *parents, leaf = path.split(".")
        for p in parents:
            node = node[p]
        node[leaf] = yaml.safe_load(value)
    return cfg


def get_latest_checkpoint_dir(base_dir: str) -> Optional[str]:
    """Latest timestamped run dir that HAS checkpoints (setup_run.py:130-148).

    Run dirs without a model_checkpoints/iter_* entry are skipped: when a new
    run resumes from its own save tree, its just-created (empty) run dir must
    not shadow the previous run's checkpoints. Ordered by mtime (stamp formats
    changed across rounds, so lexical order is not chronological)."""
    if not os.path.isdir(base_dir):
        return None
    subdirs = sorted(
        (
            os.path.join(base_dir, d)
            for d in os.listdir(base_dir)
            if os.path.isdir(os.path.join(base_dir, d))
        ),
        key=os.path.getmtime,
    )
    with_ckpt = [
        d
        for d in subdirs
        if glob.glob(os.path.join(d, "model_checkpoints", "iter_*"))
    ]
    if with_ckpt:
        return with_ckpt[-1]
    return subdirs[-1] if subdirs else None


class DatasetIterator:
    """Batched iteration over a fixed test set (fab/utils/training.py:36-52)."""

    def __init__(self, batch_size: int, dataset):
        self.dataset = dataset
        self.batch_size = min(batch_size, dataset.shape[0])
        self.test_set_n_points = dataset.shape[0]

    def __iter__(self) -> Iterator:
        for start in range(0, self.test_set_n_points, self.batch_size):
            yield self.dataset[start : start + self.batch_size]
