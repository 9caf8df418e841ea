"""Pallas TPU kernel: ONE fused affine-coupling layer for LARGE event dims.

Target shape class: the LGCP-1600 flow (D=1600 -> d_cond=d_trans=800, conditioner
MLP [800, 3200, 3200, 1600], batch 512; experiments/configs/lgcp.yaml). At these
sizes the three conditioner weight matrices total ~73 MB — far beyond VMEM — so the
whole-chain VMEM-resident kernel (fab_tpu/ops/realnvp_kernel.py, built for small
dims) does not apply. XLA's fusion also cannot merge across the three matmuls: each
intermediate activation [B, 3200] round-trips HBM between them.

This kernel instead runs ONE coupling layer per call with:
  - grid over batch tiles (TB rows) — Pallas pipelines the x-tile loads;
  - h1/h2 activations held in VMEM scratch across all three matmuls (never HBM);
  - weights streamed from HBM in 128-column blocks with double-buffered async DMA
    overlapping the MXU work (pallas_guide.md "Double Buffering");
  - bias + ReLU + (optionally tanh-capped) affine transform + log-det row-sum fused
    into the same pass.

The conditioner output width (2 * d_trans) is padded to a multiple of 128 lanes at
PARAMETER level (pad_cols below): padded columns are zero-initialised, receive zero
cotangents (outputs sliced before use), and stay zero under training.

Gradients: custom VJP whose backward re-traces the mathematically identical jnp
implementation (same weights), like realnvp_kernel.py — the fused path accelerates
the forward/inverse evaluations (flow sampling, AIS chain init, eval log-probs);
HMC's in-chain score evaluations keep XLA's fused backward.

MEASURED RESULT (TPU v5e, B=512, D=1600, H=3200; experiments/bench_lgcp_kernel.py):
correct on hardware (max err 3.6e-5 vs jnp) but an honest NEGATIVE on speed —
kernel 1.89 ms vs XLA 1.84 ms per layer fwd at matmul precision 'highest' (0.97x),
and 0.75x at 'default'. Roofline: 18.8 GFLOP/layer at the effective f32 peak
(~197/6 = 33 TFLOP/s) bounds one layer at ~0.57 ms compute vs ~0.09 ms for the
73 MB weight read at 800 GB/s — the op is COMPUTE-bound, so the HBM round-trips
of the [B, H] activations that this kernel eliminates (~20 MB/layer vs 73 MB
weights) cannot buy much, and XLA's own matmul pipelining is already at the same
~10-14 TFLOP/s. Kept off by default (flow.fused_coupling config flag) as the
starting point for shapes where the balance differs (much larger H/B ratios or
weight-resident multi-layer fusion).

Reference context: the coupling math matches fab_tpu/flows/coupling.py (reference
RealNVP layer, experiments/make_flow/make_normflow_model.py:11-30).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

NB = 128  # weight-streaming block width (one lane tile)


def _round128(n: int) -> int:
    return -(-n // 128) * 128


def _mlp3_blocks_kernel(
    TB: int,
    d_cond: int,
    d_trans: int,
    hidden: int,
    out_pad: int,
    scale_cap: float,
    inverse: bool,
    # refs:
    zc_ref,  # [TB, d_cond] VMEM (grid-blocked input)
    zt_ref,  # [TB, d_trans] VMEM
    w1_ref,  # [d_cond, hidden] ANY (HBM)
    b1_ref,  # [1, hidden] VMEM
    w2_ref,  # [hidden, hidden] ANY (HBM)
    b2_ref,  # [1, hidden] VMEM
    w3_ref,  # [hidden, out_pad] ANY (HBM)
    b3_ref,  # [1, out_pad] VMEM
    y_ref,  # [TB, d_trans] VMEM out
    ld_ref,  # [TB, 128] VMEM out (log-det broadcast over lanes; column 0 used)
    h1,  # [TB, hidden] VMEM scratch
    h2,  # [TB, hidden] VMEM scratch
    o,  # [TB, out_pad] VMEM scratch
):
    def stream_matmul(x, w_hbm, b_row, dst, n_cols, relu):
        """dst[:, :n_cols] = act(x @ w_hbm + b) with 128-col double-buffered DMA."""
        n_blocks = n_cols // NB
        k_dim = x.shape[-1]

        def body(wbuf, sem):
            def get_dma(slot, j):
                return pltpu.make_async_copy(
                    w_hbm.at[:, pl.ds(j * NB, NB)], wbuf.at[slot], sem.at[slot]
                )

            get_dma(0, 0).start()

            def loop(j, _):
                slot = j % 2

                @pl.when(j + 1 < n_blocks)
                def _():
                    get_dma((j + 1) % 2, j + 1).start()

                get_dma(slot, j).wait()
                acc = (
                    jnp.dot(x, wbuf[slot], preferred_element_type=jnp.float32)
                    + b_row[0, pl.ds(j * NB, NB)]
                )
                if relu:
                    acc = jnp.maximum(acc, 0.0)
                dst[:, pl.ds(j * NB, NB)] = acc
                return 0

            jax.lax.fori_loop(0, n_blocks, loop, 0)

        pl.run_scoped(
            body,
            pltpu.VMEM((2, k_dim, NB), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        )

    stream_matmul(zc_ref[:], w1_ref, b1_ref, h1, hidden, relu=True)
    stream_matmul(h1[:], w2_ref, b2_ref, h2, hidden, relu=True)
    stream_matmul(h2[:], w3_ref, b3_ref, o, out_pad, relu=False)

    shift = o[:, :d_trans]
    log_scale = o[:, pl.ds(d_trans, d_trans)]
    if scale_cap > 0.0:
        log_scale = scale_cap * jnp.tanh(log_scale / scale_cap)
    if inverse:
        y_ref[:] = (zt_ref[:] - shift) * jnp.exp(-log_scale)
        ld = -jnp.sum(log_scale, axis=-1, keepdims=True)
    else:
        y_ref[:] = zt_ref[:] * jnp.exp(log_scale) + shift
        ld = jnp.sum(log_scale, axis=-1, keepdims=True)
    ld_ref[:] = jnp.broadcast_to(ld, (TB, 128))


def _coupling_pallas(
    z_cond: Array,
    z_trans: Array,
    w1: Array,
    b1: Array,
    w2: Array,
    b2: Array,
    w3p: Array,
    b3p: Array,
    *,
    scale_cap: float,
    inverse: bool,
    batch_tile: int = 128,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    B, d_cond = z_cond.shape
    d_trans = z_trans.shape[-1]
    hidden = w1.shape[-1]
    out_pad = w3p.shape[-1]
    assert hidden % NB == 0 and out_pad % NB == 0, (hidden, out_pad)
    TB = min(batch_tile, B)
    assert B % TB == 0, (B, TB)
    grid = (B // TB,)

    kernel = functools.partial(
        _mlp3_blocks_kernel, TB, d_cond, d_trans, hidden, out_pad, scale_cap,
        inverse,
    )
    y, ld = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, d_cond), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, d_trans), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, out_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, d_trans), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, d_trans), jnp.float32),
            jax.ShapeDtypeStruct((B, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TB, hidden), jnp.float32),
            pltpu.VMEM((TB, hidden), jnp.float32),
            pltpu.VMEM((TB, out_pad), jnp.float32),
        ],
        interpret=interpret,
    )(
        z_cond.astype(jnp.float32),
        z_trans.astype(jnp.float32),
        w1.astype(jnp.float32),
        b1.reshape(1, -1).astype(jnp.float32),
        w2.astype(jnp.float32),
        b2.reshape(1, -1).astype(jnp.float32),
        w3p.astype(jnp.float32),
        b3p.reshape(1, -1).astype(jnp.float32),
    )
    return y, ld[:, 0]


def _coupling_jnp(
    z_cond, z_trans, w1, b1, w2, b2, w3p, b3p, *, scale_cap: float, inverse: bool
):
    """Mathematically identical jnp twin (used for the VJP and for testing)."""
    d_trans = z_trans.shape[-1]
    h = jnp.maximum(z_cond @ w1 + b1, 0.0)
    h = jnp.maximum(h @ w2 + b2, 0.0)
    out = h @ w3p + b3p
    shift, log_scale = out[..., :d_trans], out[..., d_trans : 2 * d_trans]
    if scale_cap > 0.0:
        log_scale = scale_cap * jnp.tanh(log_scale / scale_cap)
    if inverse:
        return (z_trans - shift) * jnp.exp(-log_scale), -jnp.sum(log_scale, -1)
    return z_trans * jnp.exp(log_scale) + shift, jnp.sum(log_scale, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_coupling_apply(
    z_cond, z_trans, w1, b1, w2, b2, w3p, b3p,
    scale_cap: float, inverse: bool, batch_tile: int = 128,
    interpret: bool = False,
):
    """(y_trans, log_det) of one affine-coupling layer, fused on TPU.

    ``w3p``/``b3p`` are the conditioner's last layer padded to a multiple of 128
    output columns (see pad_cols); only the first 2*d_trans columns are read.
    """
    return _coupling_pallas(
        z_cond, z_trans, w1, b1, w2, b2, w3p, b3p,
        scale_cap=scale_cap, inverse=inverse, batch_tile=batch_tile,
        interpret=interpret,
    )


def _fwd(z_cond, z_trans, w1, b1, w2, b2, w3p, b3p, scale_cap, inverse,
         batch_tile, interpret):
    out = fused_coupling_apply(
        z_cond, z_trans, w1, b1, w2, b2, w3p, b3p, scale_cap, inverse,
        batch_tile, interpret,
    )
    return out, (z_cond, z_trans, w1, b1, w2, b2, w3p, b3p)


def _bwd(scale_cap, inverse, batch_tile, interpret, residuals, cotangents):
    def f(*args):
        return _coupling_jnp(*args, scale_cap=scale_cap, inverse=inverse)

    _, vjp = jax.vjp(f, *residuals)
    return vjp(cotangents)


fused_coupling_apply.defvjp(_fwd, _bwd)


def pad_cols(w3: Array, b3: Array) -> Tuple[Array, Array]:
    """Pad the conditioner's output projection to a 128-lane multiple."""
    out = w3.shape[-1]
    pad = _round128(out) - out
    if pad == 0:
        return w3, b3
    return (
        jnp.pad(w3, ((0, 0), (0, pad))),
        jnp.pad(b3, ((0, pad),)),
    )
