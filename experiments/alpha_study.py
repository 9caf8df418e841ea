"""Alpha-ablation study: train FAB across alpha values x seeds, tabulate metrics.

Analogue of the reference's alpha study (experiments/gmm/evaluation.py:88-118 and
plot_train_alpha_study.py): the FAB loss targets g = p^alpha q^(1-alpha); the paper
ablates alpha in {0.25, 0.5, 1, 1.5, 2, 3} (alpha=2 minimises the variance of the
importance weights and wins).

Usage:
    python experiments/alpha_study.py --config experiments/configs/gmm_fast.yaml \
        [--alphas 0.5 1.0 2.0] [--seeds 0 1] [--out alpha_study.csv]
"""
from __future__ import annotations

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from fab_tpu.utils.training import apply_overrides, load_config


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="experiments/configs/gmm_fast.yaml")
    parser.add_argument(
        "--alphas", type=float, nargs="+",
        default=[0.25, 0.5, 1.0, 1.5, 2.0, 3.0],
    )
    parser.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    parser.add_argument("--num-samples", type=int, default=10_000)
    parser.add_argument("--out", default="alpha_study.csv")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from experiments.run_gmm import main as run_gmm_main  # noqa: F401 (target setup)
    from experiments.setup_run import get_n_iterations, setup_precision, setup_model
    from fab_tpu.targets import GMM
    from fab_tpu.train import Trainer, make_optimizer
    from fab_tpu.utils.logging import ListLogger

    rows = []
    for alpha in args.alphas:
        for seed in args.seeds:
            cfg = apply_overrides(load_config(args.config), args.overrides)
            cfg.fab.alpha = float(alpha)
            cfg.training.seed = int(seed)
            setup_precision(cfg)
            target = GMM(
                dim=cfg.target.dim,
                n_mixes=cfg.target.n_mixes,
                loc_scaling=cfg.target.loc_scaling,
                log_var_scaling=cfg.target.log_var_scaling,
                seed=0,
                true_expectation_estimation_n_samples=int(
                    cfg.target.get("true_expectation_n_samples", 1e6)
                ),
            )
            model = setup_model(cfg, target)
            trainer = Trainer(
                model,
                make_optimizer(cfg.training.lr, cfg.training.get("max_grad_norm")),
                logger=ListLogger(),
            )
            t = cfg.training
            n_iterations = get_n_iterations(
                t.n_iterations,
                t.get("n_flow_forward_pass"),
                t.batch_size,
                cfg.fab.loss_type,
                cfg.fab.transition_operator.n_inner_steps,
                cfg.fab.n_intermediate_distributions,
                cfg.fab.transition_operator.type,
                use_buffer=False,  # the study trains with the plain Trainer
            )
            state = trainer.run(
                jax.random.key(seed),
                n_iterations=n_iterations,
                batch_size=cfg.training.batch_size,
                save=False,
                log_every=100,
            )
            info = model.get_eval_info(
                state.params, jax.random.key(seed + 100),
                outer_batch_size=args.num_samples,
                inner_batch_size=min(args.num_samples, 1000),
                p_target=True,
            )
            row = {"alpha": alpha, "seed": seed}
            row.update({k: float(v) for k, v in info.items()})
            rows.append(row)
            print(
                f"alpha={alpha} seed={seed}: ess_flow={row['eval_ess_flow']:.4f} "
                f"ess_ais={row['eval_ess_ais']:.4f}"
            )
            # Rewrite the CSV after every completed run so an interrupted
            # study (tlimit, preemption) still leaves its finished rows.
            _write_rows(args.out, rows)
    print(f"wrote {args.out}")


def _write_rows(path, rows):
    cols = sorted({k for r in rows for k in r})
    with open(path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=cols, restval="")
        writer.writeheader()
        writer.writerows(rows)


if __name__ == "__main__":
    main()
