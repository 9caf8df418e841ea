"""Pallas TPU kernel: fully fused RealNVP forward/inverse + log-det.

EXPERIMENTAL — off by default, and here's the honest benchmark story: for the
ManyWell-32 flagship shapes (L=10, D=32, H=320, B=2048 on TPU v5e) XLA's own fusion
is already within ~10% of this kernel (measured: fused inverse 0.55-0.57 ms vs
unfused 0.60 ms), because the op sizes are latency-bound either way. Worse, at that
depth Mosaic currently miscompiles the fully unrolled 10-layer chain (correct at
L<=3/D=8 on hardware and at every size in interpret mode; at L=10 it either hits the
scoped-VMEM stack limit at tile>=256 or silently produces NaNs at smaller tiles).
Until that is resolved, ``make_realnvp(fused=True)`` should only be used for
experimentation; the jnp path is the production path. Kept because (a) the kernel is
correct by construction (interpret-mode tested vs the jnp twin) and (b) per-layer
fusion variants of it are the starting point for large-event-dim (LGCP-1600) work
where weights do NOT all fit VMEM and XLA's HBM round-trips actually bite.

The FAB hot loop evaluates flow log-probs (with input gradients) at every HMC
leapfrog step (SURVEY §3.1). This kernel fuses the ENTIRE chain into one
pallas_call: every layer's weights are resident in VMEM, a batch tile streams
through all L layers without touching HBM in between, and the log-det accumulates in
registers. Weights are per-layer 2-D operands (biases as [1, H] rows); L is static
so the layer loop unrolls at trace time. Gradients come from a custom VJP whose
backward re-traces the reference jnp implementation.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_PER_LAYER = 8  # w1, b1, w2, b2, w3, b3, wlin, lu_ld


def _kernel(L: int, d_cond: int, d_trans: int, inverse: bool, *refs):
    x_ref = refs[0]
    layer_refs = refs[1 : 1 + L * _PER_LAYER]
    out_ref, ld_ref = refs[1 + L * _PER_LAYER :]

    def layer(l: int):
        return layer_refs[l * _PER_LAYER : (l + 1) * _PER_LAYER]

    z = x_ref[:]
    ld = jnp.zeros((z.shape[0],), jnp.float32)

    def coupling(z, l, ld):
        w1, b1, w2, b2, w3, b3, _, _ = layer(l)
        zc = z[:, :d_cond]
        zt = z[:, d_cond:]
        h = jnp.maximum(
            jnp.dot(zc, w1[:], preferred_element_type=jnp.float32) + b1[0, :], 0.0
        )
        h = jnp.maximum(
            jnp.dot(h, w2[:], preferred_element_type=jnp.float32) + b2[0, :], 0.0
        )
        o = jnp.dot(h, w3[:], preferred_element_type=jnp.float32) + b3[0, :]
        shift = o[:, :d_trans]
        log_scale = o[:, d_trans:]
        if inverse:
            zt = (zt - shift) * jnp.exp(-log_scale)
            ld_new = ld - jnp.sum(log_scale, axis=-1)
        else:
            zt = zt * jnp.exp(log_scale) + shift
            ld_new = ld + jnp.sum(log_scale, axis=-1)
        return jnp.concatenate([zc, zt], axis=-1), ld_new

    if inverse:
        for l in range(L - 1, -1, -1):
            wlin, lu_ld = layer(l)[6], layer(l)[7]
            # Undo the LU mixing (wlin holds W^-1), then the coupling.
            z = jnp.dot(z, wlin[:].T, preferred_element_type=jnp.float32)
            ld = ld - lu_ld[0, 0]
            z, ld = coupling(z, l, ld)
    else:
        for l in range(L):
            wlin, lu_ld = layer(l)[6], layer(l)[7]
            z, ld = coupling(z, l, ld)
            z = jnp.dot(z, wlin[:].T, preferred_element_type=jnp.float32)
            ld = ld + lu_ld[0, 0]
    out_ref[:] = z
    ld_ref[:] = ld[:, None]


def fused_realnvp_pass(
    x: Array,
    w1: Array,  # [L, d_cond, H]
    b1: Array,  # [L, H]
    w2: Array,  # [L, H, H]
    b2: Array,  # [L, H]
    w3: Array,  # [L, H, 2*d_trans]
    b3: Array,  # [L, 2*d_trans]
    wlin: Array,  # [L, D, D] — W for forward, W^-1 for inverse
    lu_ld: Array,  # [L, 1] — per-layer LU log-det (sum log_s)
    inverse: bool,
    tile_b: int = 512,
) -> Tuple[Array, Array]:
    """One fused pass through the whole RealNVP chain. Returns (y, log_det)."""
    L, d_cond, H = w1.shape
    B, D = x.shape
    d_trans = D - d_cond
    tile_b = min(tile_b, B)
    assert B % tile_b == 0, f"batch {B} must divide tile {tile_b}"

    kernel = functools.partial(_kernel, L, d_cond, d_trans, inverse)

    def full(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    f32 = lambda a: a.astype(jnp.float32)
    operands = [f32(x)]
    in_specs = [
        pl.BlockSpec((tile_b, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    for l in range(L):
        per_layer = [
            w1[l],
            b1[l][None, :],
            w2[l],
            b2[l][None, :],
            w3[l],
            b3[l][None, :],
            wlin[l],
            lu_ld[l][None, :],
        ]
        operands.extend(f32(a) for a in per_layer)
        in_specs.extend(full(a.shape) for a in per_layer)

    out, ld = pl.pallas_call(
        kernel,
        grid=(B // tile_b,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tile_b, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
    )(*operands)
    return out.astype(x.dtype), ld[:, 0].astype(x.dtype)
