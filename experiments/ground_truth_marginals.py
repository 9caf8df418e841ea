"""Ground-truth higher-order marginal statistics of the ManyWell target.

Analogue of experiments/many_well/ground_truth_higher_order_marginals.py:44
(reference): estimate joint mode-occupancy statistics from *exact* target samples
(per-well rejection sampling), giving the ground truth that trained flows are
compared against — P(x_{2i} > 0) per well, pairwise and triple-wise joint positive-
sign probabilities, and second moments. Since wells are independent by construction,
the joint sign probabilities must factorise (product of marginals); the printed
max-deviation is a sanity check of the exact sampler itself.

Optionally compares a flow checkpoint's samples on the same statistics.

Usage:
    python experiments/ground_truth_marginals.py [--dim 32] [--n-samples 200000] \
        [--config ... --checkpoint results/mw32/seed0]
"""
from __future__ import annotations

import argparse
import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from fab_tpu.targets import ManyWellEnergy


def sign_stats(x: np.ndarray, n_wells: int, max_tuples: int = 20):
    """Per-well P(first dim > 0), plus pair/triple joint probabilities."""
    pos = x[:, 0 : 2 * n_wells : 2] > 0  # [N, n_wells]
    marg = pos.mean(axis=0)
    pairs = {}
    for i, j in itertools.islice(itertools.combinations(range(n_wells), 2), max_tuples):
        pairs[(i, j)] = float((pos[:, i] & pos[:, j]).mean())
    triples = {}
    for t in itertools.islice(itertools.combinations(range(n_wells), 3), max_tuples):
        triples[t] = float((pos[:, t[0]] & pos[:, t[1]] & pos[:, t[2]]).mean())
    return marg, pairs, triples


def report(name, x, n_wells):
    marg, pairs, triples = sign_stats(x, n_wells)
    print(f"\n== {name} ==")
    print("per-well P(x_2i+1 > 0):", np.round(marg, 4))
    pair_dev = max(
        abs(p - marg[i] * marg[j]) for (i, j), p in pairs.items()
    )
    triple_dev = max(
        abs(p - marg[i] * marg[j] * marg[k]) for (i, j, k), p in triples.items()
    )
    print(f"max |P(i,j) - P(i)P(j)|     = {pair_dev:.4f}")
    print(f"max |P(i,j,k) - prod|       = {triple_dev:.4f}")
    print("second moments E[x_d^2] (first 4 dims):", np.round((x**2).mean(0)[:4], 4))
    return marg, pair_dev, triple_dev


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dim", type=int, default=32)
    parser.add_argument("--n-samples", type=int, default=200_000)
    parser.add_argument("--config")
    parser.add_argument("--checkpoint")
    args = parser.parse_args(argv)

    target = ManyWellEnergy(dim=args.dim)
    x_exact = np.asarray(target.sample(jax.random.key(0), args.n_samples))
    marg, pair_dev, triple_dev = report("exact samples", x_exact, target.n_wells)
    assert pair_dev < 0.01 and triple_dev < 0.01, (
        "exact sampler violates well independence"
    )

    if args.checkpoint:
        from fab_tpu.utils.training import load_config
        from experiments.load_model_for_eval import load_model

        cfg = load_config(args.config)
        model, params = load_model(cfg, target, args.checkpoint)
        x_flow = np.asarray(
            model.flow.sample(
                params["flow"], jax.random.key(1), min(args.n_samples, 50_000)
            )
        )
        flow_marg, *_ = report("flow samples", x_flow, target.n_wells)
        print(
            "\nmax |flow - exact| per-well occupancy:",
            float(np.abs(flow_marg - marg).max()),
        )


if __name__ == "__main__":
    main()
