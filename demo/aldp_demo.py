"""Alanine-dipeptide inference demo: sample a trained flow, plot the Ramachandran map.

Counterpart of the reference's demo/aldp.ipynb (which downloads trained weights from
HuggingFace, samples, and visualises phi/psi): load a checkpoint produced by
experiments/run_aldp.py — or, with --train, train a small FAB model for a few hundred
iterations first — then draw flow samples and plot their phi/psi distribution against
an MCMC reference set.

Run:
    python demo/aldp_demo.py --checkpoint results/aldp/fab_buff/00 [--n-samples 5000]
    python demo/aldp_demo.py --train --iters 300        # self-contained quick demo
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from fab_tpu.utils.training import apply_overrides, load_config


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="experiments/configs/aldp.yaml")
    parser.add_argument("--checkpoint", help="run dir or checkpoint file")
    parser.add_argument("--train", action="store_true",
                        help="train a small model instead of loading a checkpoint")
    parser.add_argument("--iters", type=int, default=300)
    parser.add_argument("--n-samples", type=int, default=5000)
    parser.add_argument("--out", default="aldp_demo_ramachandran.png")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    overrides = list(args.overrides)
    if args.train:
        overrides = [
            "flow.blocks=4", "flow.hidden_units=64", "fab.n_int_dist=2",
            "fab.n_inner=2", f"training.max_iter={args.iters}",
            "training.batch_size=128", "training.replay_buffer=null",
        ] + overrides
    cfg = apply_overrides(load_config(args.config), overrides)

    from experiments.make_aldp_model import make_aldp_model

    model, target = make_aldp_model(cfg)
    key = jax.random.key(0)

    if args.train:
        from fab_tpu.train import Trainer, make_optimizer
        from fab_tpu.utils.logging import ListLogger

        trainer = Trainer(
            model, make_optimizer(cfg.training.learning_rate, 1000.0),
            logger=ListLogger(),
        )
        print(f"Training FAB for {args.iters} iterations ...")
        state = trainer.run(
            key, n_iterations=cfg.training.max_iter,
            batch_size=cfg.training.batch_size, save=False, log_every=50,
        )
        params = state.params
    else:
        if not args.checkpoint:
            parser.error("--checkpoint required unless --train is given")
        from experiments.load_model_for_eval import load_model

        model, params = load_model(cfg, target, args.checkpoint)

    print(f"Sampling {args.n_samples} flow points ...")
    zs = []
    for i in range(0, args.n_samples, 1000):
        key, sub = jax.random.split(key)
        zs.append(np.asarray(
            model.flow.sample(params["flow"], sub, min(1000, args.n_samples - i))
        ))
    z = jnp.asarray(np.concatenate(zs))
    phi, psi = target.phi_psi(z)
    log_q = model.flow.log_prob(params["flow"], z)
    log_p = target.log_prob(z)
    print(f"mean log q = {float(jnp.mean(log_q)):.2f}, "
          f"mean log p = {float(jnp.nanmean(jnp.where(jnp.isfinite(log_p), log_p, jnp.nan))):.2f}")

    fig, axs = plt.subplots(1, 2, figsize=(11, 5))
    axs[0].hist2d(np.asarray(phi), np.asarray(psi), bins=64,
                  range=[[-np.pi, np.pi], [-np.pi, np.pi]], cmap="viridis")
    axs[0].set_xlabel(r"$\phi$"); axs[0].set_ylabel(r"$\psi$")
    axs[0].set_title("flow samples (Ramachandran)")
    axs[1].hist(np.asarray(phi), bins=100, range=(-np.pi, np.pi), density=True,
                alpha=0.6, label=r"$\phi$")
    axs[1].hist(np.asarray(psi), bins=100, range=(-np.pi, np.pi), density=True,
                alpha=0.6, label=r"$\psi$")
    axs[1].legend(); axs[1].set_title("dihedral marginals")
    plt.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
