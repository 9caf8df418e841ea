"""Sample from a trained ALDP model: flow + AIS samples to .npz.

Rework of experiments/aldp/sample.py (reference :61-147): load the latest checkpoint
under a run directory, draw batched flow samples (with log q and target log p) and
batched AIS samples (with log importance weights), save to sample outputs.

Usage:
    python experiments/sample_aldp.py --config experiments/configs/aldp.yaml \
        --run <save_root> [--n-samples 100000] [--batch 1000]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from fab_tpu.checkpoint import latest_checkpoint, load_checkpoint
from fab_tpu.utils.training import apply_overrides, load_config

from experiments.make_aldp_model import make_aldp_model


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="experiments/configs/aldp.yaml")
    parser.add_argument("--run", required=True)
    parser.add_argument("--n-samples", type=int, default=100_000)
    parser.add_argument("--batch", type=int, default=1000)
    parser.add_argument("--out", default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    cfg = apply_overrides(load_config(args.config), args.overrides)

    model, target = make_aldp_model(cfg)
    ckpt = latest_checkpoint(os.path.join(args.run, "model_checkpoints"))
    if ckpt is None:
        raise FileNotFoundError(f"no checkpoint under {args.run}")
    params = load_checkpoint(ckpt)["params"]
    print(f"loaded {ckpt}")

    key = jax.random.key(0)
    flow_x, flow_logq, flow_logp = [], [], []
    ais_x, ais_logw = [], []

    @jax.jit
    def flow_chunk(key):
        x, log_q = model.flow.sample_and_log_prob(params["flow"], key, args.batch)
        return x, log_q, target.log_prob(x)

    @jax.jit
    def ais_chunk(key):
        result = model.ais.sample_and_log_weights(
            params["flow"], params["transition"], key, args.batch,
            p_target=True, tune=False,
        )
        return result.point.x, result.log_w

    n_batches = args.n_samples // args.batch
    for i in range(n_batches):
        key, k1, k2 = jax.random.split(key, 3)
        x, lq, lp = jax.device_get(flow_chunk(k1))
        flow_x.append(x)
        flow_logq.append(lq)
        flow_logp.append(lp)
        xa, lw = jax.device_get(ais_chunk(k2))
        ais_x.append(xa)
        ais_logw.append(lw)

    out = args.out or os.path.join(args.run, "samples.npz")
    np.savez_compressed(
        out,
        flow_samples=np.concatenate(flow_x),
        flow_log_q=np.concatenate(flow_logq),
        flow_log_p=np.concatenate(flow_logp),
        ais_samples=np.concatenate(ais_x),
        ais_log_w=np.concatenate(ais_logw),
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
