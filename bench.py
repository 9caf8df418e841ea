"""Headline benchmark: AIS samples/s/chip on ManyWell-32, FAB + prioritised buffer.

The measured program is ONE full training iteration of the flagship config
(experiments/configs/many_well.yaml: batch 2048, 4 intermediate distributions, HMC
L=5, RealNVP 10x10/dim, 8 replay gradient steps) — AIS pass, buffer add, Gumbel-top-k
sample, replay updates, priority adjustment — all jit-compiled. Throughput is AIS
samples per second per chip.

vs_baseline: ratio to a torch-CPU measurement of the same computational pattern
(bench_baseline_torch.py — the reference itself cannot run here as its flow-library
deps are not installed). The baseline number is measured once and cached in
baseline_measured.json. North-star target: >20x (BASELINE.md).

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "baseline_measured.json")


def measure_ours(n_warmup=2, n_steps=10, batch_size=2048, precision="highest"):
    import jax

    # Benchmark the recommended training configuration: full-f32 matmuls (TPU's
    # default bf16 multiplication materially degrades FAB training quality).
    jax.config.update("jax_default_matmul_precision", precision)

    sys.path.insert(0, REPO)
    from fab_tpu.buffer import PrioritisedReplayBuffer
    from fab_tpu.flows import make_realnvp
    from fab_tpu.model import FABModel
    from fab_tpu.parallel.mesh import activate_mesh, make_mesh
    from fab_tpu.sampling import HamiltonianMonteCarlo
    from fab_tpu.targets import ManyWellEnergy
    from fab_tpu.train import PrioritisedBufferTrainer, make_optimizer
    from fab_tpu.utils.logging import ListLogger

    n_devices = len(jax.devices())
    if n_devices > 1:
        activate_mesh(make_mesh(n_devices, 1))

    dim = 32
    target = ManyWellEnergy(dim=dim)
    flow = make_realnvp(dim, n_flow_layers=10, layer_nodes_per_dim=10, act_norm=False)
    op = HamiltonianMonteCarlo(
        n_ais_intermediate_distributions=4, n_outer=1, n_leapfrog=5, epsilon=1.0
    )
    model = FABModel.create(
        flow, target, transition_operator=op, n_intermediate_distributions=4,
        loss_type="fab_alpha_div",
    )
    buffer = PrioritisedReplayBuffer(
        dim=dim, max_length=batch_size * 16, min_sample_length=batch_size * 4
    )
    trainer = PrioritisedBufferTrainer(
        model, make_optimizer(3e-4, 100.0), buffer,
        n_batches_buffer_sampling=8, w_adjust_max_clip=10.0, logger=ListLogger(),
    )
    key = jax.random.key(0)
    state = trainer.init_state(key, batch_size=batch_size)
    step = trainer.make_train_step(batch_size=batch_size)

    for i in range(n_warmup):
        state, info = step(state, jax.random.fold_in(key, i))
    jax.block_until_ready(state)
    t0 = time.time()
    for i in range(n_steps):
        state, info = step(state, jax.random.fold_in(key, 100 + i))
    jax.block_until_ready(state)
    elapsed = time.time() - t0
    assert bool(jax.numpy.isfinite(info["loss"])), "bench loss went non-finite"

    # MFU / roofline: XLA's own cost model for the ONE compiled program that is the
    # whole training iteration, divided by measured wall time and chip peak.
    mfu = hw_flops = None
    try:
        ca = step.lower(state, jax.random.fold_in(key, 0)).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_per_step = float(ca.get("flops", 0.0))
        if flops_per_step > 0:
            achieved = flops_per_step * n_steps / elapsed / n_devices
            peak = _chip_peak_flops(jax.devices()[0], precision)
            hw_flops = achieved
            mfu = achieved / peak if peak else None
    except Exception as e:  # cost model availability varies by backend
        print(f"cost analysis unavailable: {e}", file=sys.stderr)
    return batch_size * n_steps / elapsed / n_devices, mfu, hw_flops


def _chip_peak_flops(device, precision: str) -> float:
    """Peak matmul FLOPs/s for the benched device at the benched precision.

    TPU v5e: 197 TFLOP/s bf16. At jax_default_matmul_precision='highest' each f32
    matmul runs as 6 bf16 passes, so the effective f32 peak is ~197/6 TFLOP/s —
    the MFU is reported against THAT number (the relevant roofline for the
    numerics FAB needs), with the bf16 figure in BASELINE.md for context.
    CPU fallback: assume 50 GFLOP/s/core * local core count (rough)."""
    kind = getattr(device, "device_kind", "")
    if "v5 lite" in kind or "v5e" in kind:
        peak_bf16 = 197e12
    elif "v4" in kind:
        peak_bf16 = 275e12
    elif "v6" in kind:
        peak_bf16 = 918e12
    elif "TPU" in kind or "tpu" in kind.lower():
        peak_bf16 = 197e12
    else:
        import os as _os

        return 50e9 * (_os.cpu_count() or 1)
    passes = {"default": 1, "high": 3, "highest": 6}.get(precision, 1)
    return peak_bf16 / passes


def get_torch_baseline():
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["samples_per_s"]
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench_baseline_torch.py")],
        capture_output=True, text=True, timeout=1800,
        env=dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS=""),
    )
    data = json.loads(result.stdout.strip().splitlines()[-1])
    with open(BASELINE_CACHE, "w") as f:
        json.dump(data, f)
    return data["samples_per_s"]


def main():
    value, mfu, hw_flops = measure_ours()
    try:
        baseline = get_torch_baseline()
        vs = value / baseline
    except Exception as e:  # baseline measurement must never sink the bench
        print(f"baseline measurement failed: {e}", file=sys.stderr)
        vs = float("nan")
    print(
        json.dumps(
            {
                "metric": "ManyWell-32 FAB+buffer AIS samples/s/chip",
                "value": round(value, 2),
                "unit": "samples/s/chip",
                "vs_baseline": round(vs, 2) if vs == vs else None,
                "mfu": round(mfu, 4) if mfu is not None else None,
                "achieved_flops_per_s": (
                    round(hw_flops) if hw_flops is not None else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
