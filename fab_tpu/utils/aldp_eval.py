"""ALDP evaluation: marginal KLDs, Ramachandran metrics, chirality filter.

Rework of fab/utils/aldp.py:13-323. Metrics (same definitions/binning as the
reference): per-dimension 200-bin histogram KLDs of the normalised internal
coordinates split into bond/angle/dihedral groups (aldp.py:73-107); 1-D KLDs of the
backbone phi/psi dihedrals and the 2-D 64-bin Ramachandran KLD (aldp.py:109-148) —
computed with our own dihedral geometry (fab_tpu/targets/internal_coords.py) instead
of mdtraj; CSV metric appends and marginal/Ramachandran plots.

Our internal layout is [b1, b2, a2 | bonds(19) | angles(19) | dihedrals(19)], so the
group split is a fixed slicing (the reference reconstructs it through boltzgen index
arrays, aldp.py:81-107).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

N_Z = 19
BOND_DIMS = tuple([0, 1] + list(range(3, 3 + N_Z)))
ANGLE_DIMS = tuple([2] + list(range(3 + N_Z, 3 + 2 * N_Z)))
DIH_DIMS = tuple(range(3 + 2 * N_Z, 3 + 3 * N_Z))

# Dihedral flow-dims of HA (atom 9, z-row 7) and CB (atom 10, z-row 8) about the
# CA-N axis: their wrapped difference distinguishes the L- from the D-form
# (analogue of fab/utils/aldp.py:308-323 which uses its own layout's indices).
CHIRALITY_DIMS = (3 + 2 * N_Z + 7, 3 + 2 * N_Z + 8)


def _hist_kld(test: np.ndarray, gen: np.ndarray, nbins: int, lo: float, hi: float):
    """KLD(test || gen) from density histograms (aldp.py:73-79 semantics)."""
    eps = 1e-10
    htest, _ = np.histogram(test, nbins, range=(lo, hi), density=True)
    hgen, _ = np.histogram(gen, nbins, range=(lo, hi), density=True)
    return float(
        np.sum(htest * np.log((htest + eps) / (hgen + eps))) * (hi - lo) / nbins
    )


def _wrap(a: np.ndarray) -> np.ndarray:
    return (a + np.pi) % (2 * np.pi) - np.pi


def filter_chirality(
    z_flow: np.ndarray,
    ind=CHIRALITY_DIMS,
    mean_diff: Optional[float] = None,
    threshold: float = 0.8,
    scale=None,
    shift=None,
    *,
    raw: bool = False,
) -> np.ndarray:
    """Boolean mask of samples in the L-alanine chirality basin.

    The difference of the HA and CB dihedrals about the CA frame (RAW radians,
    IUPAC dihedral sign) sits near -2pi/3 for the L-form and +2pi/3 for the
    D-form — calibrated on the committed openmmtools L-alanine OpenMM minimum
    and its explicit mirror image (tests/test_aldp.py), and cross-checked
    against the geometric CA signed volume (targets/aldp.ca_signed_volume).
    Samples within ``threshold`` of ``mean_diff`` (default -2pi/3 = L) pass.

    ``scale``/``shift`` unscale flow coordinates back to raw radians:
    dim 48 (HA, z-row 7) is NOT in the circular-dim list, so the normalised
    transform standardises it ((raw - mean)/std); dim 49 (CB) is circular and
    stays raw. Pass ``scale=(transform.std[ind[0]], transform.std[ind[1]])``
    and ``shift=(transform.mean[...])`` — or use
    ``chirality_scale_shift(transform)``. They are REQUIRED unless ``raw=True``
    explicitly declares the input is already raw radians — omitting them on
    flow (standardised) coords silently reintroduces the round-3 unit-mixing
    bug class, so the safe path is opt-out, not opt-in.

    (Round-3's version subtracted the SCALED dim 48 from the raw dim 49 —
    dimensionally incoherent — which selected the D-form near the reference
    geometry while reporting it as L. The reference hard-codes its own
    layout's empirical -0.043, aldp.py:308.)
    """
    if (scale is None or shift is None) and not raw:
        raise ValueError(
            "filter_chirality: pass scale=/shift= (chirality_scale_shift("
            "transform)) for flow-space coords, or raw=True if the input is "
            "genuinely raw radians."
        )
    if mean_diff is None:
        mean_diff = -2.0 * np.pi / 3.0
    a = z_flow[:, ind[0]]
    b = z_flow[:, ind[1]]
    if scale is not None:
        a = a * scale[0]
        b = b * scale[1]
    if shift is not None:
        a = a + shift[0]
        b = b + shift[1]
    diff = _wrap(_wrap(a) - _wrap(b))
    return np.abs(_wrap(diff - mean_diff)) < threshold


def chirality_scale_shift(transform, ind=CHIRALITY_DIMS):
    """(scale, shift) tuples mapping flow coords at ``ind`` to raw radians."""
    return (
        (float(transform.std[ind[0]]), float(transform.std[ind[1]])),
        (float(transform.mean[ind[0]]), float(transform.mean[ind[1]])),
    )


def make_chirality_filter_jax(
    ind=CHIRALITY_DIMS,
    mean_diff: Optional[float] = None,
    threshold: float = 0.8,
    min_frac: float = 0.1,
    scale=None,
    shift=None,
    *,
    raw: bool = False,
):
    """Pure-JAX train-time chirality filter: ``(x, mask) -> mask``.

    Analogue of the reference's train-time ``filter_chirality`` application
    (experiments/aldp/train.py:228-243,318-326 with fab_buff.yaml
    ``filter_chirality: train``): D-form AIS samples are removed before the loss /
    buffer-add. The reference drops rows (dynamic shapes); here the returned mask
    marks them invalid so they carry -inf importance weight. The reference's
    ``torch.mean(1.*ind_L) > 0.1`` guard (don't filter when almost everything is
    D-form, which would starve training) is reproduced with ``min_frac``, computed
    over currently-valid rows.
    """
    import jax.numpy as jnp

    if (scale is None or shift is None) and not raw:
        raise ValueError(
            "make_chirality_filter_jax: pass scale=/shift= (chirality_scale_"
            "shift(transform)) for flow-space coords, or raw=True if the input "
            "is genuinely raw radians."
        )
    if mean_diff is None:
        mean_diff = -2.0 * np.pi / 3.0
    i0, i1 = ind
    s0, s1 = (1.0, 1.0) if scale is None else scale
    t0, t1 = (0.0, 0.0) if shift is None else shift

    def wrap(a):
        return (a + np.pi) % (2 * np.pi) - np.pi

    def sample_filter(x, mask):
        # Unscale to RAW radians before differencing (see filter_chirality).
        diff = wrap(wrap(x[:, i0] * s0 + t0) - wrap(x[:, i1] * s1 + t1))
        ind_l = jnp.abs(wrap(diff - mean_diff)) < threshold
        n_valid = jnp.maximum(jnp.sum(mask), 1)
        frac_l = jnp.sum(ind_l & mask) / n_valid
        return jnp.where(frac_l > min_frac, mask & ind_l, mask)

    return sample_filter


def evaluate_aldp(
    target,
    z_sample: np.ndarray,
    z_test: np.ndarray,
    iteration: int = 0,
    metric_dir: Optional[str] = None,
    plot_dir: Optional[str] = None,
    batch_size: int = 1000,
) -> Dict[str, float]:
    """Compute the reference's ALDP metric suite; optionally append CSVs + plots.

    ``z_sample`` / ``z_test`` are flow-space (normalised internal) configurations;
    ``target`` is a fab_tpu AldpBoltzmann (provides phi_psi and the transform).
    """
    import jax.numpy as jnp

    z_sample = np.asarray(z_sample)
    z_test = np.asarray(z_test)
    ch_scale, ch_shift = chirality_scale_shift(target.transform)

    # Marginal KLDs over normalised internal coords (aldp.py:60-107).
    nbins = 200
    lo, hi = -5.0, 5.0
    dim = z_sample.shape[1]
    kld = np.array(
        [
            _hist_kld(z_test[:, i], z_sample[:, i], nbins, lo, hi)
            if i not in DIH_DIMS
            else _hist_kld(
                _wrap(z_test[:, i]), _wrap(z_sample[:, i]), nbins, -np.pi, np.pi
            )
            for i in range(dim)
        ]
    )
    kld_bond = kld[list(BOND_DIMS)]
    kld_angle = kld[list(ANGLE_DIMS)]
    kld_dih = kld[list(DIH_DIMS)]

    # phi/psi + Ramachandran KLDs (aldp.py:109-148).
    def phi_psi(z):
        out_phi, out_psi = [], []
        for start in range(0, len(z), batch_size):
            p, s = target.phi_psi(jnp.asarray(z[start : start + batch_size]))
            out_phi.append(np.asarray(p))
            out_psi.append(np.asarray(s))
        return np.concatenate(out_phi), np.concatenate(out_psi)

    phi, psi = phi_psi(z_sample)
    phi_d, psi_d = phi_psi(z_test)
    ok = np.isfinite(phi) & np.isfinite(psi)
    phi, psi = phi[ok], psi[ok]
    ok_d = np.isfinite(phi_d) & np.isfinite(psi_d)
    phi_d, psi_d = phi_d[ok_d], psi_d[ok_d]

    kld_phi = _hist_kld(phi_d, phi, nbins, -np.pi, np.pi)
    kld_psi = _hist_kld(psi_d, psi, nbins, -np.pi, np.pi)

    nbins_ram = 64
    eps = 1e-10
    h_test = np.histogram2d(
        phi_d, psi_d, nbins_ram, range=[[-np.pi, np.pi]] * 2, density=True
    )[0]
    h_gen = np.histogram2d(
        phi, psi, nbins_ram, range=[[-np.pi, np.pi]] * 2, density=True
    )[0]
    kld_ram = float(
        np.sum(h_test * np.log((h_test + eps) / (h_gen + eps)))
        * (2 * np.pi / nbins_ram) ** 2
    )

    metrics = {
        "iter": iteration,
        "kld_bond_mean": float(kld_bond.mean()),
        "kld_bond_max": float(kld_bond.max()),
        "kld_angle_mean": float(kld_angle.mean()),
        "kld_angle_max": float(kld_angle.max()),
        "kld_dih_mean": float(kld_dih.mean()),
        "kld_dih_max": float(kld_dih.max()),
        "kld_phi": kld_phi,
        "kld_psi": kld_psi,
        "kld_ram": kld_ram,
        "frac_L_form": float(np.mean(filter_chirality(
            z_sample, scale=ch_scale, shift=ch_shift))),
        # αL-region (positive-φ) mass in model samples vs test set: the
        # reference's headline claim is discovery of BOTH φ modes
        # (/root/reference/README.md:89-94); the minor mode carries ~0.2-0.4%
        # mass (reference MD anchor: experiments/aldp_external_anchor.py), so
        # this is the direct detector for it.
        "frac_phi_pos_sample": float(((phi > 0.0) & (phi < 2.4)).mean()),
        "frac_phi_pos_test": float(((phi_d > 0.0) & (phi_d < 2.4)).mean()),
    }

    if metric_dir is not None:
        os.makedirs(metric_dir, exist_ok=True)
        path = os.path.join(metric_dir, "metrics.csv")
        header = not os.path.exists(path)
        with open(path, "a") as f:
            if header:
                f.write(",".join(metrics.keys()) + "\n")
            f.write(",".join(str(v) for v in metrics.values()) + "\n")

    if plot_dir is not None:
        os.makedirs(plot_dir, exist_ok=True)
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axs = plt.subplots(1, 2, figsize=(10, 4))
        axs[0].hist2d(
            phi_d, psi_d, bins=nbins_ram, range=[[-np.pi, np.pi]] * 2,
            cmap="viridis",
        )
        axs[0].set_title("test data")
        axs[1].hist2d(
            phi, psi, bins=nbins_ram, range=[[-np.pi, np.pi]] * 2, cmap="viridis"
        )
        axs[1].set_title("model samples")
        for ax in axs:
            ax.set_xlabel(r"$\phi$")
            ax.set_ylabel(r"$\psi$")
        fig.savefig(os.path.join(plot_dir, f"ramachandran_{iteration:06d}.png"))
        plt.close(fig)

        # Marginal overlays for the dihedral group (the interesting one).
        fig, axs = plt.subplots(4, 5, figsize=(16, 10))
        for j, d in enumerate(DIH_DIMS):
            ax = axs.ravel()[j]
            ax.hist(_wrap(z_test[:, d]), 60, density=True, alpha=0.5, label="test")
            ax.hist(_wrap(z_sample[:, d]), 60, density=True, alpha=0.5, label="model")
            ax.set_title(f"dih {j}")
        axs.ravel()[0].legend()
        fig.tight_layout()
        fig.savefig(os.path.join(plot_dir, f"marginals_dih_{iteration:06d}.png"))
        plt.close(fig)

    return metrics
