"""Aggregate training histories across run directories into one tidy CSV.

Counterpart of the reference's experiments/gmm/download_wandb_runs.py:22 (which
pulled run metric series from wandb for the paper's training-curve plots). Here run
histories live on disk — ListLogger pickles (logging_hist.pkl) and CSVLogger files
(logging_hist.csv) — so this script walks run dirs, tags each row with the run name
and iteration, and writes one long-format CSV ready for plotting. If wandb is
installed and --wandb-project is given, it pulls from wandb instead.

Usage:
    python experiments/export_runs.py --runs results/gmm --out gmm_histories.csv \
        [--keys loss ess_ais eval_ess_flow]
"""
from __future__ import annotations

import argparse
import csv
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_history(run_dir: str):
    """Returns dict-of-lists from a run dir's logging artifacts."""
    pkl = os.path.join(run_dir, "logging_hist.pkl")
    if os.path.exists(pkl):
        with open(pkl, "rb") as f:
            return pickle.load(f)
    csv_path = os.path.join(run_dir, "logging_hist.csv")
    if os.path.exists(csv_path):
        with open(csv_path) as f:
            rows = list(csv.DictReader(f))
        hist = {}
        for row in rows:
            for k, v in row.items():
                try:
                    hist.setdefault(k, []).append(float(v))
                except (TypeError, ValueError):
                    pass
        return hist
    return None


def find_runs(base: str):
    """Yield (run_name, run_dir) for every dir holding a logging artifact."""
    for root, _dirs, files in os.walk(base):
        if "logging_hist.pkl" in files or "logging_hist.csv" in files:
            yield os.path.relpath(root, base), root


def export_wandb(project: str, keys):  # pragma: no cover — wandb not in this image
    import wandb

    api = wandb.Api()
    for run in api.runs(project):
        hist = run.history(keys=keys) if keys else run.history()
        yield run.name, {k: list(hist[k]) for k in hist.columns}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--runs", help="base directory containing run dirs")
    parser.add_argument("--wandb-project", help="pull from wandb instead of disk")
    parser.add_argument("--keys", nargs="*", help="restrict to these metric keys")
    parser.add_argument("--out", default="run_histories.csv")
    args = parser.parse_args(argv)

    if args.wandb_project:
        histories = list(export_wandb(args.wandb_project, args.keys))
    else:
        if not args.runs:
            parser.error("one of --runs / --wandb-project is required")
        histories = []
        for name, run_dir in sorted(find_runs(args.runs)):
            hist = load_history(run_dir)
            if hist:
                histories.append((name, hist))

    n_rows = 0
    with open(args.out, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["run", "step", "key", "value"])
        for name, hist in histories:
            for key, series in hist.items():
                if args.keys and key not in args.keys:
                    continue
                try:
                    iter(series)
                except TypeError:
                    series = [series]
                for step, value in enumerate(series):
                    try:
                        writer.writerow([name, step, key, float(value)])
                        n_rows += 1
                    except (TypeError, ValueError):
                        pass
    print(f"wrote {args.out}: {len(histories)} runs, {n_rows} rows")


if __name__ == "__main__":
    main()
