"""Rebuild a model from config and load checkpointed params for evaluation.

Analogue of experiments/load_model_for_eval.py:8-16 (reference).
"""
from __future__ import annotations

import os
import sys
from typing import Optional, Tuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fab_tpu.checkpoint import latest_checkpoint, load_checkpoint
from fab_tpu.model import FABModel

from experiments.setup_run import setup_model


def load_model(cfg, target, checkpoint_path: str) -> Tuple[FABModel, dict]:
    """Returns (model, params) with params loaded from a checkpoint file or a run
    directory (in which case the latest iter_N checkpoint is resolved)."""
    model = setup_model(cfg, target)
    if os.path.isdir(checkpoint_path):
        resolved: Optional[str] = latest_checkpoint(
            os.path.join(checkpoint_path, "model_checkpoints")
        ) or latest_checkpoint(checkpoint_path)
        if resolved is None:
            raise FileNotFoundError(f"no checkpoint under {checkpoint_path}")
        checkpoint_path = resolved
    state = load_checkpoint(checkpoint_path)
    params = state["params"]
    return model, params
