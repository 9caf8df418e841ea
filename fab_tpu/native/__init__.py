"""Native host energy server: C++ batched energy/force evaluation for ALDP.

This is the fab-tpu counterpart of the reference's only native dependency — OpenMM's
C++ engine driven through boltzgen's thread-parallel wrapper
(fab/target_distributions/aldp.py:146-153). The shared library
(aldp_energy.cpp) is compiled on demand with g++, parameter tables are injected from
fab_tpu/targets/aldp_ff.py (single source of truth shared with the JAX backend), and
evaluation enters JAX through ``jax.pure_callback`` with a custom VJP backed by the
C++ analytic forces.

The JAX (on-device) backend remains the default compute path on TPU; this server
exists for (a) architecture parity with the reference, (b) cross-checking the JAX
potential, and (c) as the integration point for real OpenMM when it is installed.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "aldp_energy.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libaldp_energy.so")


def _build_library() -> str:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB,
        "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _LIB


class AldpEnergyServer:
    """ctypes wrapper around the C++ batched energy/force kernel.

    ``gb=True`` additionally enables the GBSA-OBC2 implicit-solvent term (native
    analogue of the reference's implicit-solvent OpenMM system,
    fab/target_distributions/aldp.py:93-94) with parameters taken from the same
    tables as the JAX backend.

    NOTE: the C++ library holds ONE process-global parameter set (tables + GB
    flag); constructing a second server re-initialises it, so the most recently
    constructed server defines the active potential. One target per process is
    the supported pattern (matching the reference's per-process OpenMM context).
    """

    def __init__(self, tables, n_threads: int = 4, gb: bool = False):
        self.lib = ctypes.CDLL(_build_library())
        self.lib.aldp_energy_batch.restype = None
        self.n_atoms = 22  # ALDP
        self.dim = 3 * self.n_atoms
        c_int_p = np.ctypeslib.ndpointer(np.int32, flags="C")
        c_dbl_p = np.ctypeslib.ndpointer(np.float64, flags="C")
        self.lib.aldp_ff_init.argtypes = [
            ctypes.c_int, ctypes.c_int, c_int_p, c_dbl_p, c_dbl_p,
            ctypes.c_int, c_int_p, c_dbl_p, c_dbl_p,
            ctypes.c_int, c_int_p, c_dbl_p, c_int_p, c_dbl_p,
            ctypes.c_int, c_int_p, c_dbl_p, c_dbl_p, c_dbl_p,
            ctypes.c_int,
        ]
        t = tables
        self.lib.aldp_ff_init(
            22,
            len(t.bond_k), np.ascontiguousarray(t.bond_idx, np.int32),
            np.ascontiguousarray(t.bond_k, np.float64),
            np.ascontiguousarray(t.bond_r0, np.float64),
            len(t.angle_k), np.ascontiguousarray(t.angle_idx, np.int32),
            np.ascontiguousarray(t.angle_k, np.float64),
            np.ascontiguousarray(t.angle_t0, np.float64),
            len(t.torsion_k), np.ascontiguousarray(t.torsion_idx, np.int32),
            np.ascontiguousarray(t.torsion_k, np.float64),
            np.ascontiguousarray(t.torsion_n, np.int32),
            np.ascontiguousarray(t.torsion_phase, np.float64),
            len(t.pair_qq), np.ascontiguousarray(t.pair_idx, np.int32),
            np.ascontiguousarray(t.pair_qq, np.float64),
            np.ascontiguousarray(t.pair_eps, np.float64),
            np.ascontiguousarray(t.pair_rmin, np.float64),
            int(n_threads),
        )
        from fab_tpu.targets import aldp_ff as ff

        self.lib.aldp_gb_init.argtypes = [
            ctypes.c_int, c_dbl_p, c_dbl_p, c_dbl_p,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_int,
        ]
        # Always call (a previously-loaded library may have GB enabled from an
        # earlier server with gb=True — the flag must reflect THIS server).
        self.lib.aldp_gb_init(
            22,
            np.ascontiguousarray(t.charges, np.float64),
            np.ascontiguousarray(t.gb_radius, np.float64),
            np.ascontiguousarray(t.gb_scale, np.float64),
            float(ff.GB_OFFSET), float(ff.COULOMB_CONST),
            float(ff.SOLUTE_DIELECTRIC), float(ff.SOLVENT_DIELECTRIC),
            float(ff.GB_PROBE), float(ff.GB_SA_FACTOR),
            float(ff.GB_ALPHA), float(ff.GB_BETA), float(ff.GB_GAMMA),
            int(bool(gb)),
        )
        self.gb = bool(gb)

    # ------------------------------------------------------------- host numpy

    def energy_and_force(self, pos: np.ndarray):
        """pos [B, 22, 3] (Angstrom) -> (energy [B] kcal/mol, force [B, 22, 3])."""
        pos = np.ascontiguousarray(pos.reshape(-1, self.dim), np.float64)
        batch = pos.shape[0]
        energy = np.empty(batch, np.float64)
        force = np.empty((batch, self.dim), np.float64)
        self.lib.aldp_energy_batch(
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int(batch),
            energy.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            force.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return energy, force.reshape(batch, self.n_atoms_out(), 3)

    def n_atoms_out(self) -> int:
        return 22

    # --------------------------------------------------------------- jax path

    def energy_jax(self, pos: jnp.ndarray) -> jnp.ndarray:
        """Differentiable energy via pure_callback; VJP uses the C++ forces.

        pos [..., 22, 3] -> [...] kcal/mol. The callback leaves the device once per
        AIS transition step, batched — the same batching structure the reference
        relies on for its OpenMM bridge (SURVEY §7.3).
        """
        return _energy_callback(self, pos)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _energy_callback(server: AldpEnergyServer, pos):
    batch_shape = pos.shape[:-2]
    flat = pos.reshape((-1, 22, 3))

    dtype = flat.dtype

    def host_fn(p):
        e, _ = server.energy_and_force(np.asarray(p, np.float64))
        return e.astype(dtype)

    e = jax.pure_callback(
        host_fn,
        jax.ShapeDtypeStruct((flat.shape[0],), dtype),
        flat,
        vmap_method="sequential",
    )
    return e.reshape(batch_shape)


def _energy_fwd(server, pos):
    batch_shape = pos.shape[:-2]
    flat = pos.reshape((-1, 22, 3))

    dtype = flat.dtype

    def host_fn(p):
        e, f = server.energy_and_force(np.asarray(p, np.float64))
        return e.astype(dtype), f.astype(dtype)

    e, f = jax.pure_callback(
        host_fn,
        (
            jax.ShapeDtypeStruct((flat.shape[0],), dtype),
            jax.ShapeDtypeStruct((flat.shape[0], 22, 3), dtype),
        ),
        flat,
        vmap_method="sequential",
    )
    e = e.reshape(batch_shape)
    grad = (-f).reshape(batch_shape + (22, 3))
    return e, grad


def _energy_bwd(server, grad_residual, g):
    return (g[..., None, None] * grad_residual,)


_energy_callback.defvjp(_energy_fwd, _energy_bwd)
