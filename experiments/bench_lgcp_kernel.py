"""Benchmark: large-dim fused coupling kernel vs plain XLA at LGCP-1600 shapes.

Measures (a) one coupling layer forward/inverse, (b) the full LGCP flow
sample_and_log_prob and log_prob, kernel vs jnp, on the real TPU. Writes a summary
to stdout; used to decide/record whether the Pallas path pays at large event dims
(BASELINE.md "Pallas study" row).

Usage: python experiments/bench_lgcp_kernel.py [--batch 512] [--layers 8]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--dim", type=int, default=1600)
    p.add_argument("--nodes-per-dim", type=int, default=2)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--precision", default="highest")
    args = p.parse_args(argv)

    jax.config.update("jax_default_matmul_precision", args.precision)
    from fab_tpu.flows import make_realnvp
    from fab_tpu.flows.large_coupling import LargeFusedCoupling

    dim, B = args.dim, args.batch
    width = dim * args.nodes_per_dim
    key = jax.random.key(0)

    # ---- single layer
    layer_k = LargeFusedCoupling(hidden_units=width, scale_cap=5.0)
    params = layer_k.init(key, dim)
    params["mlp"][-1]["w"] = 0.01 * jax.random.normal(
        jax.random.fold_in(key, 1), params["mlp"][-1]["w"].shape
    )
    z = jax.random.normal(jax.random.fold_in(key, 2), (B, dim))

    from fab_tpu.flows.coupling import AffineCoupling

    fwd_k = jax.jit(lambda p, z: layer_k.forward_and_log_det(p, z))
    # jnp reference: the parent class's method bound to the same layer/params.
    fwd_j = jax.jit(lambda p, z: AffineCoupling.forward_and_log_det(layer_k, p, z))
    inv_k = jax.jit(lambda p, z: layer_k.inverse_and_log_det(p, z))
    inv_j = jax.jit(lambda p, z: AffineCoupling.inverse_and_log_det(layer_k, p, z))

    y_k, ld_k = fwd_k(params, z)
    y_j, ld_j = fwd_j(params, z)
    err = float(jnp.max(jnp.abs(y_k - y_j)))
    print(f"single-layer fwd correctness on hardware: max err {err:.3e}")
    assert err < 1e-3, "kernel wrong on hardware"

    t_k = timeit(fwd_k, params, z)
    t_j = timeit(fwd_j, params, z)
    print(f"layer fwd: kernel {t_k*1e3:.3f} ms  xla {t_j*1e3:.3f} ms  "
          f"speedup {t_j/t_k:.2f}x")
    t_ki = timeit(inv_k, params, z)
    t_ji = timeit(inv_j, params, z)
    print(f"layer inv: kernel {t_ki*1e3:.3f} ms  xla {t_ji*1e3:.3f} ms  "
          f"speedup {t_ji/t_ki:.2f}x")

    # roofline context
    flops = 2 * B * (dim // 2) * width + 2 * B * width * width + 2 * B * width * (
        dim + 128
    )
    wbytes = 4 * ((dim // 2) * width + width * width + width * (dim + 128))
    print(f"per-layer: {flops/1e9:.1f} GFLOP, weights {wbytes/1e6:.1f} MB; "
          f"kernel achieves {flops/t_k/1e12:.2f} TFLOP/s, "
          f"weight-stream BW {wbytes/t_k/1e9:.1f} GB/s")

    # ---- full flow
    for fused in (False, True):
        flow = make_realnvp(
            dim, n_flow_layers=args.layers, layer_nodes_per_dim=args.nodes_per_dim,
            act_norm=False, scale_cap=5.0, fused_coupling=fused,
        )
        fparams = flow.init(jax.random.key(3))
        sample = jax.jit(lambda p, k: flow.sample_and_log_prob(p, k, B))
        logp = jax.jit(lambda p, x: flow.log_prob(p, x))
        x, _ = sample(fparams, key)
        t_s = timeit(sample, fparams, key)
        t_l = timeit(logp, fparams, x)
        print(f"flow fused_coupling={fused}: sample_and_log_prob {t_s*1e3:.2f} ms, "
              f"log_prob {t_l*1e3:.2f} ms   [{B / t_s:.0f} samples/s]")


if __name__ == "__main__":
    main()
