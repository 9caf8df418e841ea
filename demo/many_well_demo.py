"""FAB vs reverse-KL on ManyWell-6: the reference's headline demo
(demo/many_well.ipynb, README "FAB-vs-KL visible <5 min") as a script.

Trains the same flow architecture once with the FAB alpha-2 loss (AIS + HMC) and
once with plain reverse KL, then compares mode coverage: reverse KL collapses to a
subset of the 2^3 = 8 modes, FAB covers them all.

Run (CPU is fine):
    python demo/many_well_demo.py [--iters 500]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fab_tpu.flows import make_realnvp
from fab_tpu.model import FABModel
from fab_tpu.sampling import HamiltonianMonteCarlo
from fab_tpu.targets import ManyWellEnergy
from fab_tpu.train import Trainer, make_optimizer
from fab_tpu.utils.logging import ListLogger


def train(loss_type: str, n_iterations: int, key):
    target = ManyWellEnergy(dim=6)
    flow = make_realnvp(6, n_flow_layers=8, layer_nodes_per_dim=16, act_norm=False)
    hmc = HamiltonianMonteCarlo(
        n_ais_intermediate_distributions=4, n_leapfrog=5, epsilon=1.0
    )
    model = FABModel.create(
        flow, target, transition_operator=hmc, n_intermediate_distributions=4,
        loss_type=loss_type,
    )
    logger = ListLogger()
    trainer = Trainer(model, make_optimizer(2e-4, 100.0), logger=logger)
    state = trainer.run(
        key, n_iterations=n_iterations, batch_size=128, save=False, log_every=10
    )
    return model, state, target


def mode_coverage(model, state, target, key, n=4000):
    x = model.flow.sample(state.params["flow"], key, n)
    signs = np.sign(np.asarray(x)[:, 0::2])  # well signs per sample
    modes = {tuple(s) for s in signs}
    counts = {m: int(np.sum(np.all(signs == m, axis=1))) for m in sorted(modes)}
    return counts


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=500)
    args = parser.parse_args()
    key = jax.random.key(0)
    results = {}
    for loss in ["fab_alpha_div", "flow_reverse_kl"]:
        print(f"=== training with {loss} ===")
        model, state, target = train(loss, args.iters, key)
        counts = mode_coverage(model, state, target, jax.random.fold_in(key, 1))
        results[loss] = counts
        print(f"{loss}: {len(counts)}/8 modes covered -> {counts}")
    n_fab = len(results["fab_alpha_div"])
    n_kl = len(results["flow_reverse_kl"])
    print(f"\nFAB covered {n_fab}/8 modes; reverse KL covered {n_kl}/8.")


if __name__ == "__main__":
    main()
