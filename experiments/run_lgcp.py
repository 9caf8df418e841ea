"""Log-Gaussian-Cox-process experiment entry (1600-D stretch; fab-jax scope).

Usage:
    python experiments/run_lgcp.py --config experiments/configs/lgcp.yaml
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fab_tpu.targets import LogGaussianCoxProcess
from fab_tpu.utils.training import apply_overrides, load_config, maybe_enable_x64

from experiments.setup_run import setup_trainer_and_run_flow


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="experiments/configs/lgcp.yaml")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    cfg = apply_overrides(load_config(args.config), args.overrides)
    maybe_enable_x64(cfg)
    target = LogGaussianCoxProcess(grid_size=cfg.target.grid_size,
        in_graph_kernel=bool(cfg.target.get('in_graph_kernel', False)))
    assert target.dim == cfg.target.dim
    setup_trainer_and_run_flow(cfg, target, plotter=None)


if __name__ == "__main__":
    main()
