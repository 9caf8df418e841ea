"""Re-evaluate a trained ALDP run against a chirality-filtered (L-form) test set.

Why: the reference's validation data is an MD trajectory of L-alanine dipeptide
(pure L-form; experiments/aldp/train.py loads data/val which comes from an MD run
started from the L-form structure), while fab-tpu's self-generated MCMC test set
(run_aldp.py generate_test_set) can hop between the two mirror chirality basins
during long HMC (observed: 44% L / 56% D) — against such a racemic test set every
single-chirality flow scores a saturated kld_phi/kld_ram regardless of quality.
This script recomputes the metric suite with the D-form test rows dropped,
matching the reference's (implicitly L-only) evaluation.

Usage:
    python experiments/reeval_aldp.py --config experiments/configs/aldp.yaml \
        --run results/aldp/fab_buff_r3/00 [--n-samples 10000] [--out-dir reports/aldp_r3]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from fab_tpu.checkpoint import latest_checkpoint, load_checkpoint
from fab_tpu.utils.aldp_eval import (
    chirality_scale_shift,
    evaluate_aldp,
    filter_chirality,
)
from fab_tpu.utils.training import apply_overrides, load_config, maybe_enable_x64

from experiments.make_aldp_model import make_aldp_model


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="experiments/configs/aldp.yaml")
    parser.add_argument("--run", required=True)
    parser.add_argument("--n-samples", type=int, default=10_000)
    parser.add_argument("--batch", type=int, default=1000)
    parser.add_argument("--out-dir", default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    cfg = apply_overrides(load_config(args.config), args.overrides)
    maybe_enable_x64(cfg)

    model, target = make_aldp_model(cfg)
    ckpt = latest_checkpoint(os.path.join(args.run, "model_checkpoints"))
    if ckpt is None:
        raise FileNotFoundError(f"no checkpoint under {args.run}")
    state = load_checkpoint(ckpt)
    params = state["params"]
    it = int(os.path.basename(os.path.dirname(ckpt)).split("_")[-1])
    print(f"loaded {ckpt} (iter {it})")

    z_test = np.load(os.path.join(args.run, "test_set.npy"))
    scale, shift = chirality_scale_shift(target.transform)
    keep = np.asarray(
        filter_chirality(jax.numpy.asarray(z_test), scale=scale, shift=shift)
    )
    print(
        f"test set: {len(z_test)} rows, frac_L_form={keep.mean():.4f} -> "
        f"keeping {int(keep.sum())} L-form rows"
    )
    if keep.mean() <= 0.1:  # guard like the reference (aldp/train.py:230)
        raise RuntimeError(
            f"only {keep.mean():.1%} of the stored test set is L-form; an "
            "L-only re-evaluation on this set would be degenerate. Regenerate "
            "the test set (experiments/run_aldp.py)."
        )
    z_test_l = z_test[keep]

    key = jax.random.key(0)
    sample = jax.jit(
        lambda k: model.flow.sample(params["flow"], k, args.batch)
    )
    zs = []
    for _ in range(0, args.n_samples, args.batch):
        key, sub = jax.random.split(key)
        zs.append(np.asarray(sample(sub)))
    z_sample = np.concatenate(zs)[: args.n_samples]

    out_dir = args.out_dir or os.path.join(args.run, "reeval_L_only")
    metrics = evaluate_aldp(
        target,
        z_sample,
        z_test_l,
        iteration=it,
        metric_dir=os.path.join(out_dir, "metrics"),
        plot_dir=os.path.join(out_dir, "plots"),
    )
    print({k: round(float(v), 5) for k, v in metrics.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())
