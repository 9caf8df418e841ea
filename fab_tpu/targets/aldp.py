"""Alanine-dipeptide Boltzmann target in internal coordinates.

Rework of fab/target_distributions/aldp.py:17-159. The flow lives in the 60-D
normalised internal-coordinate space; log_prob maps flow coords -> Cartesian via the
z-matrix transform (internal_coords.py), evaluates the classical potential
(aldp_ff.py — pure JAX, so the entire AIS/HMC chain stays on-device; or the C++ host
energy server in fab_tpu/native mirroring the reference's threaded OpenMM bridge),
applies the reference's energy regularisation (log-scale above energy_cut, clamp at
energy_max, NaN -> max; boltzgen semantics per aldp.py:18-22), and adds the transform
log-det.

The transform's normalisation statistics come from a self-generated minimum-energy
configuration (the reference generates/loads reference positions the same way,
aldp.py:103-137): an idealised geometry is built through the z-matrix and relaxed by
gradient descent on the potential.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fab_tpu.targets.aldp_ff import (
    KB_KCAL,
    build_tables,
    energy_kcal,
    gb_energy_kcal,
)
from fab_tpu.targets.base import LogProbFn, TargetDistribution
from fab_tpu.targets.internal_coords import (
    NormalizedInternalTransform,
    ZMatrixTransform,
)

Array = jnp.ndarray

# Z-matrix of the reference, 'internal' mode (fab/target_distributions/aldp.py:66-88).
Z_MATRIX = (
    (0, (1, 4, 6)),
    (1, (4, 6, 8)),
    (2, (1, 4, 0)),
    (3, (1, 4, 0)),
    (4, (6, 8, 14)),
    (5, (4, 6, 8)),
    (7, (6, 8, 4)),
    (9, (8, 6, 4)),
    (10, (8, 6, 4)),
    (11, (10, 8, 6)),
    (12, (10, 8, 11)),
    (13, (10, 8, 11)),
    (15, (14, 8, 16)),
    (16, (14, 8, 6)),
    (17, (16, 14, 15)),
    (18, (16, 14, 8)),
    (19, (18, 16, 14)),
    (20, (18, 16, 19)),
    (21, (18, 16, 19)),
)
CART_INDICES = (8, 6, 14)
N_ATOMS = 22

# Circular dihedrals by z-matrix row (make_aldp_model.py:28): methyl rotors,
# phi/psi and peptide-adjacent rotations.
IND_CIRC_DIH = (0, 1, 2, 3, 4, 5, 8, 9, 10, 13, 15, 16)

# phi = C(4)-N(6)-CA(8)-C(14); psi = N(6)-CA(8)-C(14)-N(16)  (standard defs).
PHI_ATOMS = (4, 6, 8, 14)
PSI_ATOMS = (6, 8, 14, 16)


def ca_signed_volume(pos: np.ndarray) -> np.ndarray:
    """Stereochemistry scalar at CA(8): (N6-CA) x (C14-CA) . (CB10-CA) for
    pos [..., 22, 3]. POSITIVE for L-alanine (calibrated on the committed
    openmmtools L-form OpenMM minimum, tests/data/aldp_openmm_min_energy_nm.npy,
    signed volume +2.56 A^3); mirror images negate it exactly."""
    ca, n, c, cb = pos[..., 8, :], pos[..., 6, :], pos[..., 14, :], pos[..., 10, :]
    return np.einsum("...i,...i->...", np.cross(n - ca, c - ca), cb - ca)


def _ideal_internal_coords(zmat: ZMatrixTransform) -> np.ndarray:
    """Chemically sensible starting internal coordinates (bond r0s, tetrahedral/
    trigonal angles, staggered dihedrals) used to seed the energy minimisation."""
    from fab_tpu.targets.aldp_ff import ATOM_TYPES, BOND_PARAMS

    def bond_r0(i, j):
        ti, tj = ATOM_TYPES[i], ATOM_TYPES[j]
        params = BOND_PARAMS.get((ti, tj)) or BOND_PARAMS.get((tj, ti))
        return params[1]

    s1, s2, s3 = zmat.cart_indices
    seed = [bond_r0(s2, s1), bond_r0(s3, s1), np.deg2rad(111.0)]
    bonds, angles, dihs = [], [], []
    group_count: Dict[Tuple[int, int], int] = {}
    for atom, (r1, r2, r3) in zmat.z_matrix:
        bonds.append(bond_r0(atom, r1))
        sp2 = ATOM_TYPES[r1] in ("C", "N")
        angles.append(np.deg2rad(120.0 if sp2 else 109.5))
        key = (r1, r2)
        n_prev = group_count.get(key, 0)
        group_count[key] = n_prev + 1
        if ATOM_TYPES[atom] in ("HC", "H1") and ATOM_TYPES[r1] == "CT":
            dih = 60.0 + 120.0 * n_prev  # staggered methyl hydrogens
        else:
            dih = 180.0 - 25.0 * n_prev  # extended backbone, offset siblings
        dihs.append(np.deg2rad(((dih + 180.0) % 360.0) - 180.0))
    return np.array(seed + bonds + angles + dihs)


class AldpBoltzmann(TargetDistribution):
    def __init__(
        self,
        data_path: Optional[str] = None,
        temperature: float = 1000.0,
        energy_cut: float = 1.0e8,
        energy_max: float = 1.0e20,
        n_threads: int = 4,
        transform: str = "internal",
        ind_circ_dih=IND_CIRC_DIH,
        env: str = "vacuum",
        backend: str = "jax",
        minimise_steps: int = 4000,
    ):
        assert transform == "internal", "only the internal transform is implemented"
        if env not in ("vacuum", "implicit"):
            raise NotImplementedError("This environment is not implemented.")
        # env="implicit" adds the GBSA-OBC2 solvation term (aldp_ff.gb_energy_kcal),
        # matching the reference's openmmtools AlanineDipeptideImplicit
        # (aldp.py:93-94).
        self.env = env
        self.dim = 3 * N_ATOMS - 6
        self.temperature = temperature
        self.kT = KB_KCAL * temperature
        self.energy_cut = energy_cut  # in reduced (kT) units, like boltzgen
        self.energy_max = energy_max
        self.backend = backend
        self.n_threads = n_threads
        self.tables = build_tables()

        zmat = ZMatrixTransform(
            n_atoms=N_ATOMS, z_matrix=Z_MATRIX, cart_indices=CART_INDICES
        )
        # Reference configuration: load or self-generate by minimising the
        # potential from an idealised geometry (replaces aldp.py:103-137's
        # OpenMM minimisation).
        if data_path is not None:
            ref_cart = np.load(data_path).reshape(-1, N_ATOMS * 3)
        else:
            ref_cart = self._minimise(zmat, minimise_steps)
        # Enforce L-alanine handedness (round-4 fix): the idealised z-matrix
        # seed happened to build the MIRROR (D) form, and every downstream
        # artifact inherited it — the transform's mean/std fit, the HMC
        # test-set seeds, and the flow's z=0 basin. The potential is achiral,
        # so the mirror image of a minimum is an equally valid minimum: if the
        # reference configuration is D-form (negative CA signed volume),
        # reflect it to L.
        pos = ref_cart.reshape(-1, N_ATOMS, 3)
        d_form = ca_signed_volume(pos) < 0.0
        if np.any(d_form):
            pos = pos.copy()
            pos[d_form, :, 0] *= -1.0
            ref_cart = pos.reshape(-1, N_ATOMS * 3)
        assert np.all(ca_signed_volume(ref_cart.reshape(-1, N_ATOMS, 3)) > 0.0)
        self.ref_cartesian = ref_cart
        self.transform = NormalizedInternalTransform.from_data(
            zmat,
            ref_cart,
            ind_circ_dih=ind_circ_dih,
            # Reference default stds are nm (aldp.py:22); ours are Angstrom.
            default_std={"bond": 0.05, "angle": 0.15, "dih": 0.2},
        )
        if backend == "host_cpp":
            from fab_tpu.native import AldpEnergyServer

            self._server = AldpEnergyServer(
                self.tables, n_threads=n_threads, gb=(env == "implicit")
            )

    # ------------------------------------------------------------------ energy

    def _potential_kcal(self, pos: Array) -> Array:
        """Full potential [kcal/mol] for pos [..., N_ATOMS, 3]: vacuum terms plus,
        for env='implicit', the GBSA-OBC2 solvation energy."""
        e = energy_kcal(self.tables, pos)
        if self.env == "implicit":
            e = e + gb_energy_kcal(self.tables, pos)
        return e

    def _minimise(self, zmat: ZMatrixTransform, steps: int) -> np.ndarray:
        z0 = _ideal_internal_coords(zmat)
        x0, _ = zmat.internal_to_cartesian(jnp.asarray(z0)[None])
        x = x0.reshape(N_ATOMS, 3)

        energy = self._potential_kcal
        grad = jax.grad(energy)
        lr = 1e-4

        # Whole descent as ONE compiled fori_loop: per-step host dispatches would
        # cost minutes through a remote-device tunnel.
        @jax.jit
        def descend(x):
            def body(_, x):
                g = jnp.clip(jnp.nan_to_num(grad(x)), -1e3, 1e3)
                return x - lr * g

            return jax.lax.fori_loop(0, steps, body, x)

        x = descend(x)
        e_final = float(energy(x))
        assert np.isfinite(e_final), "ALDP minimisation diverged"
        return np.asarray(x).reshape(1, N_ATOMS * 3)

    def reduced_energy(self, x_cartesian: Array) -> Array:
        """Regularised potential in kT units (boltzgen semantics, aldp.py:18-22):
        u for u < cut; cut + log(u - cut + 1) above; clamped at max; NaN -> max."""
        pos = x_cartesian.reshape(x_cartesian.shape[:-1] + (N_ATOMS, 3))
        if self.backend == "host_cpp":
            # The C++ server evaluates the FULL potential (vacuum terms + the
            # GBSA-OBC2 solvation term when env='implicit'; native analytic
            # forces drive the VJP).
            e_kcal = self._server.energy_jax(pos)
        else:
            e_kcal = self._potential_kcal(pos)
        u = e_kcal / self.kT
        u = jnp.where(
            u < self.energy_cut,
            u,
            self.energy_cut + jnp.log1p(jnp.abs(u - self.energy_cut)),
        )
        u = jnp.nan_to_num(u, nan=self.energy_max, posinf=self.energy_max)
        return jnp.minimum(u, self.energy_max)

    # ------------------------------------------------------------------ density

    def log_prob(self, z_flow: Array) -> Array:
        """Unnormalised Boltzmann log-density in normalised internal coords.

        Rows whose internal coordinates are unphysical (bond <= 0 or angle outside
        (0, pi)) have zero density: they get log-prob -inf, computed on a sanitised
        configuration so no NaN can leak into gradients (the AIS mask machinery
        then excludes such rows; the reference relies on row-dropping instead,
        ais.py:190-213)."""
        mean = jnp.asarray(self.transform.mean, z_flow.dtype)
        std = jnp.asarray(self.transform.std, z_flow.dtype)
        internal = z_flow * std + mean
        n_z = len(Z_MATRIX)
        bonds = internal[..., jnp.asarray([0, 1] + list(range(3, 3 + n_z)))]
        angles = internal[..., jnp.asarray([2] + list(range(3 + n_z, 3 + 2 * n_z)))]
        valid = jnp.all(bonds > 1e-2, -1) & jnp.all(
            (angles > 1e-2) & (angles < jnp.pi - 1e-2), -1
        )
        z_safe = jnp.where(valid[..., None], z_flow, 0.0)
        x_cart, log_det = self.transform.flow_to_cartesian(z_safe)
        log_p = -self.reduced_energy(x_cart) + log_det
        return jnp.where(valid, log_p, -jnp.inf)

    def phi_psi(self, z_flow: Array) -> Tuple[Array, Array]:
        """Backbone dihedrals of flow-space samples (for Ramachandran metrics)."""
        from fab_tpu.targets.internal_coords import dihedral_angle

        x_cart, _ = self.transform.flow_to_cartesian(z_flow)
        pos = x_cart.reshape(x_cart.shape[:-1] + (N_ATOMS, 3))
        phi = dihedral_angle(*[pos[..., a, :] for a in PHI_ATOMS])
        psi = dihedral_angle(*[pos[..., a, :] for a in PSI_ATOMS])
        return phi, psi

    def performance_metrics(
        self,
        samples: Array,
        log_w: Array,
        log_q_fn: Optional[LogProbFn] = None,
        batch_size: Optional[int] = None,
        mask: Optional[Array] = None,
        key: Optional[jax.Array] = None,
    ) -> Dict[str, Array]:
        return {}  # matches aldp.py:158-159; rich eval lives in utils/aldp_eval.py
