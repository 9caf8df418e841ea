"""Four-way φ-marginal overlay: flow vs test set vs FF scan vs reference MD.

The single figure that settles the round-5 ALDP verdict: the trained flow's φ
marginal against (a) the in-house HMC test set, (b) the in-house potential's
sampler-independent rigid-scan Boltzmann marginal, and (c) the reference's
external MD ground truth (digitized; experiments/aldp_external_anchor.py).
Also reports peak positions, basin masses, and the αL-region mass of each,
with the flow's αL mass given with its MC error.

Usage: python experiments/aldp_phi_overlay.py --run results/aldp/fab_buff_r5/00
       [--n-samples 50000] [--out-prefix reports/aldp_phi_overlay]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run", default="results/aldp/fab_buff_r5/00")
    p.add_argument("--config", default="experiments/configs/aldp.yaml")
    p.add_argument("--n-samples", type=int, default=50_000)
    p.add_argument("--out-prefix", default="reports/aldp_phi_overlay")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from fab_tpu.checkpoint import latest_checkpoint, load_checkpoint
    from fab_tpu.utils.training import apply_overrides, load_config

    from experiments.aldp_external_anchor import digitize_reference_phi_density
    from experiments.make_aldp_model import make_aldp_model

    cfg = apply_overrides(load_config(args.config), args.overrides)
    model, target = make_aldp_model(cfg)

    ckpt = latest_checkpoint(os.path.join(args.run, "model_checkpoints"))
    state = load_checkpoint(ckpt)
    params = state["params"]
    it = int(os.path.basename(os.path.dirname(ckpt)).split("_")[-1])
    print(f"loaded {ckpt} (iter {it})")

    # Flow samples -> phi/psi.
    key = jax.random.key(0)
    B = 2000
    sample = jax.jit(lambda k: model.flow.sample(params["flow"], k, B))
    phis, psis = [], []
    for _ in range(0, args.n_samples, B):
        key, sub = jax.random.split(key)
        z = sample(sub)
        a, b = target.phi_psi(z)
        phis.append(np.asarray(a))
        psis.append(np.asarray(b))
    phi_f = np.concatenate(phis)[: args.n_samples]
    psi_f = np.concatenate(psis)[: args.n_samples]
    ok = np.isfinite(phi_f)
    phi_f = phi_f[ok]

    # Test set.
    z_test = np.load(os.path.join(args.run, "test_set.npy"))
    pt, st_ = [], []
    for i in range(0, len(z_test), B):
        a, b = target.phi_psi(jnp.asarray(z_test[i : i + B]))
        pt.append(np.asarray(a))
    phi_t = np.concatenate(pt)
    phi_t = phi_t[np.isfinite(phi_t)]

    # Rigid-scan Boltzmann marginal (sampler-independent, in-house FF).
    d = np.loadtxt("reports/aldp_torsion_scan.csv", delimiter=",", skiprows=1)
    n = int(np.sqrt(len(d)))
    kT = 0.0019872041 * 300
    w = np.exp(-(d[:, 2] - d[:, 2].min()) / kT).reshape(n, n)
    phi_scan = d[:, 0].reshape(n, n)[:, 0]
    p_scan = w.sum(1)
    p_scan = p_scan / np.trapezoid(p_scan, phi_scan)

    # Reference MD (external).
    phi_md, den_md, _ = digitize_reference_phi_density()

    nb = 100
    h_f, edges = np.histogram(phi_f, nb, range=(-np.pi, np.pi), density=True)
    h_t, _ = np.histogram(phi_t, nb, range=(-np.pi, np.pi), density=True)
    centers = 0.5 * (edges[:-1] + edges[1:])

    def peak(c, h):
        return float(c[np.argmax(h)])

    def mass(c, h, lo, hi):
        m = (c >= lo) & (c < hi)
        return float(np.trapezoid(h[m], c[m]))

    n_pos = int(((phi_f > 0) & (phi_f < 2.4)).sum())
    frac_pos = n_pos / len(phi_f)
    report = {
        "iter": it,
        "n_flow_samples": int(len(phi_f)),
        "peaks": {
            "flow": peak(centers, h_f),
            "test_set": peak(centers, h_t),
            "ff_scan": peak(phi_scan, p_scan),
            "reference_md": peak(phi_md, den_md),
        },
        "mass_phi_lt_m1.6": {
            "flow": mass(centers, h_f, -np.pi, -1.6),
            "test_set": mass(centers, h_t, -np.pi, -1.6),
            "ff_scan": mass(phi_scan, p_scan, -np.pi, -1.6),
            "reference_md": mass(phi_md, den_md, -np.pi, -1.6),
        },
        "mass_alphaL_region": {
            "flow": frac_pos,
            "flow_mc_stderr": float(np.sqrt(max(n_pos, 1)) / len(phi_f)),
            "flow_count": n_pos,
            "test_set": float(((phi_t > 0) & (phi_t < 2.4)).mean()),
            "ff_scan": mass(phi_scan, p_scan, 0, 2.4),
            "reference_md": mass(phi_md, den_md, 0, 2.4),
        },
    }
    os.makedirs(os.path.dirname(args.out_prefix), exist_ok=True)
    with open(args.out_prefix + ".json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 4.5))
    ax.semilogy(phi_md, den_md, "k-", lw=2, label="reference MD (external)")
    ax.semilogy(phi_scan, p_scan, "C2--", lw=1.5,
                label="in-house FF rigid-scan Boltzmann")
    ax.semilogy(centers, np.maximum(h_t, 1e-6), "C0-", lw=1.2,
                label="HMC test set")
    ax.semilogy(centers, np.maximum(h_f, 1e-6), "C3-", lw=1.2,
                label=f"FAB flow (iter {it})")
    ax.set_xlabel(r"$\phi$")
    ax.set_ylabel("density")
    ax.set_ylim(1e-5, 3)
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(args.out_prefix + ".png", dpi=130)
    print("wrote", args.out_prefix + ".png")


if __name__ == "__main__":
    main()
