"""Scaling-efficiency harness: flagship train-step throughput across mesh sizes.

North-star scaling target (BASELINE.md): >80% samples/s scaling efficiency from 1
host to N>=2 hosts. This harness runs the ManyWell-32 FAB + prioritised-buffer train
step (the bench.py program) on growing device meshes and reports samples/s,
samples/s/device, and efficiency vs the single-device run.

On a real pod slice, launch one process per host (jax.distributed is initialised by
fab_tpu.parallel.distributed) and the mesh spans all chips. On a single chip this
degenerates to the bench.py measurement. For harness validation without hardware,
run on virtual CPU devices (numbers are NOT meaningful for efficiency — CPU "devices"
share cores — but the sharded program paths are real):

    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python bench_scaling.py --mesh-sizes 1 2 4 8 --check-only

Prints one JSON line per mesh size:
    {"n_devices": N, "samples_per_s": X, "samples_per_s_per_device": Y,
     "efficiency_vs_1": Z}
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def measure(n_devices, batch_size, n_steps, n_warmup, precision, devices):
    import jax

    jax.config.update("jax_default_matmul_precision", precision)
    from fab_tpu.buffer import PrioritisedReplayBuffer
    from fab_tpu.flows import make_realnvp
    from fab_tpu.model import FABModel
    from fab_tpu.parallel.mesh import make_mesh, use_mesh
    from fab_tpu.sampling import HamiltonianMonteCarlo
    from fab_tpu.targets import ManyWellEnergy
    from fab_tpu.train import PrioritisedBufferTrainer, make_optimizer
    from fab_tpu.utils.logging import ListLogger

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
    mesh = make_mesh(n_devices, 1, devices=devices[:n_devices])
    with use_mesh(mesh):
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
        assert bool(jax.numpy.isfinite(info["loss"])), "loss went non-finite"
    return batch_size * n_steps / elapsed


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--mesh-sizes", type=int, nargs="+", default=None,
                        help="device counts to sweep (default: 1..all, powers of 2)")
    parser.add_argument("--batch-per-device", type=int, default=2048,
                        help="weak scaling: global batch = this x n_devices")
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--precision", default="highest")
    parser.add_argument("--check-only", action="store_true",
                        help="tiny shapes, 1 step: validate the sharded program "
                             "compiles+runs at each mesh size")
    args = parser.parse_args(argv)

    import jax

    devices = jax.devices()
    sizes = args.mesh_sizes
    if sizes is None:
        sizes, n = [], 1
        while n <= len(devices):
            sizes.append(n)
            n *= 2
    sizes = [s for s in sizes if s <= len(devices)]

    batch_per_device = 64 if args.check_only else args.batch_per_device
    steps = 1 if args.check_only else args.steps
    warmup = 1 if args.check_only else args.warmup

    base = None
    for n in sizes:
        sps = measure(
            n, batch_per_device * n, steps, warmup, args.precision, devices
        )
        per_dev = sps / n
        if base is None:
            base = per_dev
        print(json.dumps({
            "n_devices": n,
            "samples_per_s": round(sps, 1),
            "samples_per_s_per_device": round(per_dev, 1),
            "efficiency_vs_1": round(per_dev / base, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
