"""Repeated quadratic-expectation bias estimation for GMM checkpoints.

Analogue of experiments/gmm/evaluation_expectation_quadratic_func.py:15-43
(reference): for each (method, seed) checkpoint, repeat `n_repeats` times —
draw `num_samples` flow samples, form importance weights w = p/q, and estimate
the fixed-seed quadratic expectation (fab/utils/numerical.py:33-51) both
importance-weighted and unweighted (uniform weights over finite rows). A
"target" control row evaluates the same estimator on exact target samples.
Reports mean |bias| and the bias standard deviation per model.

Usage:
    python experiments/evaluate_expectation.py --config experiments/configs/gmm.yaml \
        --run fab_buffer_seed0=results/gmm_buffer/seed0 [--run ...] \
        [--num-samples 1000] [--n-repeats 100] [--out gmm_results_expectation.csv]
"""
from __future__ import annotations

import argparse
import csv
import os
import sys
from collections import defaultdict
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fab_tpu.targets import GMM
from fab_tpu.utils.training import apply_overrides, load_config, maybe_enable_x64

from experiments.load_model_for_eval import load_model


def bias_pair(target, samples, log_w):
    """(weighted, unweighted) normalised quadratic-expectation bias on the finite
    rows of log_w (reference drops non-finite rows, evaluation_…:30-34; here
    they are masked out instead of changing shapes)."""
    mask = jnp.isfinite(log_w)
    weighted = target.evaluate_expectation(samples, log_w, mask)
    # Reference additionally drops rows whose softmax(log_w) underflows to
    # exactly 0 before the unweighted estimate (evaluation_…:35-37,
    # valid_indices_unweighted); reproduce that on the finite rows.
    w_bar = jax.nn.softmax(jnp.where(mask, log_w, -jnp.inf), axis=0)
    mask_unweighted = mask & (w_bar > 0)
    unweighted = target.evaluate_expectation(
        samples, jnp.zeros_like(log_w), mask_unweighted
    )
    return weighted, unweighted


def evaluate_model(cfg, target, path, key, num_samples, n_repeats):
    model, params = load_model(cfg, target, path)

    @jax.jit
    def one(key):
        x, log_q = model.flow.sample_and_log_prob(params["flow"], key, num_samples)
        log_w = target.log_prob(x) - log_q
        return bias_pair(target, x, log_w)

    b, bu = jax.vmap(one)(jax.random.split(key, n_repeats))
    return np.asarray(b), np.asarray(bu)


def evaluate_target(target, key, num_samples, n_repeats):
    @jax.jit
    def one(key):
        x = target.sample(key, num_samples)
        return bias_pair(target, x, jnp.zeros(num_samples))

    b, bu = jax.vmap(one)(jax.random.split(key, n_repeats))
    return np.asarray(b), np.asarray(bu)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="experiments/configs/gmm.yaml")
    parser.add_argument(
        "--run", action="append", default=[],
        help="name=path (checkpoint file or run dir); repeatable. The 'target' "
        "control row is always included.",
    )
    parser.add_argument("--num-samples", type=int, default=1000)
    parser.add_argument("--n-repeats", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default="gmm_results_expectation.csv")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    cfg = apply_overrides(load_config(args.config), args.overrides)
    maybe_enable_x64(cfg)
    target = GMM(
        dim=cfg.target.dim,
        n_mixes=cfg.target.n_mixes,
        loc_scaling=cfg.target.loc_scaling,
        log_var_scaling=cfg.target.log_var_scaling,
        seed=0,  # the GMM problem instance is always seed 0 (gmm/evaluation.py:18)
        true_expectation_estimation_n_samples=int(
            cfg.target.get("true_expectation_n_samples", 1e7)
        ),
    )

    key = jax.random.key(args.seed)
    rows = []

    def record(name, biases, biases_unweighted):
        rows.append({
            "model_name": name,
            "bias": float(np.mean(np.abs(biases))),
            "std": float(np.std(biases)),
            "bias_unweighted": float(np.mean(np.abs(biases_unweighted))),
        })
        print(rows[-1])

    key, sub = jax.random.split(key)
    record("target", *evaluate_target(target, sub, args.num_samples, args.n_repeats))
    for spec in args.run:
        name, path = spec.split("=", 1)
        key, sub = jax.random.split(key)
        record(
            name,
            *evaluate_model(cfg, target, path, sub, args.num_samples, args.n_repeats),
        )

    with open(args.out, "w", newline="") as f:
        writer = csv.DictWriter(
            f, fieldnames=["model_name", "bias", "std", "bias_unweighted"]
        )
        writer.writeheader()
        writer.writerows(rows)

    # mean / sem per method over seeds (evaluation_…:79-83).
    grouped = defaultdict(list)
    for r in rows:
        grouped[r["model_name"].rsplit("_seed", 1)[0]].append(r)
    print("\n*** per-method mean (sem over seeds) ***")
    for name, rs in grouped.items():
        for k in ("bias", "bias_unweighted"):
            vals = [r[k] for r in rs]
            sem = np.std(vals) / max(len(vals) - 1, 1) ** 0.5
            print(f"{name}: {k} = {np.mean(vals):.5f} ({sem:.5f})")
    return rows


if __name__ == "__main__":
    main()
