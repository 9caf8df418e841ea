"""Visualise the DoubleWell exact rejection sampler: envelope + sample histogram.

Analogue of experiments/many_well/rejection_sampling_vis.py:57 (reference): plot the
unnormalised first-dimension target density p(x1), the k*q proposal envelope, and a
histogram of rejection-sampled draws, verifying k*q >= p everywhere (the envelope
validity assertion of the reference's rejection_sampling_test.py:26-40).

Usage:
    python experiments/rejection_sampling_vis.py [--n-samples 100000] \
        [--out rejection_sampling.png]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

from fab_tpu.targets.double_well import DW_Z_DIM1, DoubleWellEnergy


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-samples", type=int, default=100_000)
    parser.add_argument("--out", default="rejection_sampling.png")
    args = parser.parse_args(argv)

    dw = DoubleWellEnergy()
    xs = jnp.linspace(-4.0, 4.0, 1000)
    log_p = -dw.energy_dim_1(xs)  # = -x^4 + 6x^2 + 0.5x for the canonical constants
    log_kq = jnp.log(DW_Z_DIM1 * 3) + dw._proposal_log_prob(xs)
    gap = np.asarray(log_kq - log_p)
    assert gap.min() > 0, f"envelope violated: min log(kq/p) = {gap.min():.4f}"
    print(f"envelope OK: min log(kq/p) = {gap.min():.4f} at x = "
          f"{float(xs[gap.argmin()]):.3f}")

    x1 = np.asarray(dw.sample_first_dimension(jax.random.key(0), args.n_samples))
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.hist(x1, bins=200, density=True, alpha=0.4, label="rejection samples")
    ax.plot(xs, np.exp(log_p) / DW_Z_DIM1, label="p(x1) (normalised)")
    ax.plot(xs, np.exp(np.asarray(log_kq)) / DW_Z_DIM1, "--",
            label="k q(x1) envelope / Z")
    ax.legend()
    ax.set_xlabel("$x_1$")
    plt.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
