"""ALDP step profiler: attribute one training iteration's wall-clock.

Round-4 verdict item 7: the flagship ALDP run does 0.66 it/s at batch 1024
(675 samples/s) vs 68.9k samples/s on MW-32 — this script times each component
of the iteration on the real TPU and writes a jax.profiler trace so the cost
can be attributed (target energy+grad vs internal-coords transform vs spline
flow fwd/inv/grad vs HMC chain vs replay updates) before optimising anything.

Usage:
    python experiments/profile_aldp.py [--config experiments/configs/aldp.yaml]
        [--batch 1024] [--trace-dir /tmp/aldp_trace] [overrides...]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fab_tpu.buffer import PrioritisedReplayBuffer
from fab_tpu.train import PrioritisedBufferTrainer, make_optimizer
from fab_tpu.utils.logging import ListLogger
from fab_tpu.utils.training import apply_overrides, load_config

from experiments.make_aldp_model import make_aldp_model


def bench(fn, *args, n=20, warmup=3):
    """Median-ish wall time of jitted fn (blocks on result)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="experiments/configs/aldp.yaml")
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--trace-dir", default="")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)
    cfg = apply_overrides(load_config(args.config), args.overrides)
    jax.config.update(
        "jax_default_matmul_precision",
        cfg.training.get("matmul_precision", "highest"),
    )
    print(f"matmul_precision={cfg.training.get('matmul_precision', 'highest')}")

    model, target = make_aldp_model(cfg)
    B = args.batch
    key = jax.random.key(0)
    params = model.init(key)
    flow, fp = model.flow, None
    fp = params["flow"]

    x, _ = jax.jit(lambda k: flow.sample_and_log_prob(fp, k, B))(key)

    rows = []

    def report(name, seconds, count_per_iter):
        rows.append((name, seconds, count_per_iter))
        print(
            f"{name:42s} {seconds * 1e3:9.2f} ms/call  x{count_per_iter:5.1f}/iter"
            f"  = {seconds * count_per_iter * 1e3:9.2f} ms/iter"
        )

    n_dists = model.ais.n_intermediate_distributions
    n_leap = model.ais.transition_operator.n_leapfrog
    n_replay = int(cfg.training.replay_buffer.n_updates)

    # --- leaf components -------------------------------------------------
    t_sample = bench(jax.jit(lambda k: flow.sample_and_log_prob(fp, k, B)), key)
    report("flow.sample_and_log_prob", t_sample, 1)

    t_logq = bench(jax.jit(lambda x: flow.log_prob(fp, x)), x)
    report("flow.log_prob (fwd)", t_logq, 0)

    grad_logq = jax.jit(
        lambda x: jax.vmap(jax.grad(lambda xi: flow.log_prob(fp, xi[None])[0]))(x)
    )
    t_glogq = bench(grad_logq, x)
    # HMC leapfrogs recompute grad log q at every step of every dist + the MH
    # endpoint evaluations.
    report("grad_x flow.log_prob", t_glogq, n_dists * (n_leap + 1))

    t_logp = bench(jax.jit(target.log_prob), x)
    report("target.log_prob (fwd)", t_logp, 0)

    grad_logp = jax.jit(
        lambda x: jax.vmap(jax.grad(lambda xi: target.log_prob(xi[None])[0]))(x)
    )
    t_glogp = bench(grad_logp, x)
    report("grad_x target.log_prob", t_glogp, n_dists * (n_leap + 1))

    # Internal-coords transform alone (inside target.log_prob).
    t_ic = bench(
        jax.jit(lambda z: target.transform.flow_to_cartesian(z)[0]), x
    )
    report("internal->cartesian transform (fwd)", t_ic, 0)

    # Flow param-gradient (replay update core).
    def replay_loss(fp_, x_):
        return jnp.mean(flow.log_prob(fp_, x_))

    t_replay_grad = bench(
        jax.jit(lambda fp_, x_: jax.grad(replay_loss)(fp_, x_)), fp, x
    )
    report("grad_params flow.log_prob (replay core)", t_replay_grad, n_replay)

    # --- composite programs ---------------------------------------------
    ais_fn = jax.jit(
        lambda tp, k: model.ais.sample_and_log_weights(fp, tp, k, B, False, True)
    )
    tp = params["transition"]
    t_ais = bench(ais_fn, tp, key)
    report("FULL AIS pass (sample + 8-dist HMC)", t_ais, 1)

    buffer = PrioritisedReplayBuffer(
        dim=target.dim,
        max_length=cfg.training.replay_buffer.max_length * B,
        min_sample_length=cfg.training.replay_buffer.min_length * B,
    )
    trainer = PrioritisedBufferTrainer(
        model, make_optimizer(1e-4, 100.0), buffer,
        n_batches_buffer_sampling=n_replay,
        w_adjust_max_clip=cfg.training.replay_buffer.get("max_adjust_w_clip"),
        logger=ListLogger(),
    )
    print("filling buffer ...")
    state = trainer.init_state(key, batch_size=B)
    step = trainer.make_train_step(batch_size=B)
    t_step = bench(lambda s, k: step(s, k), state, key, n=10)
    report("FULL train step (AIS+add+sample+replay)", t_step, 1)
    print(f"\n=> {1.0 / t_step:.2f} it/s, {B / t_step:.0f} samples/s")

    if args.trace_dir:
        os.makedirs(args.trace_dir, exist_ok=True)
        with jax.profiler.trace(args.trace_dir):
            for _ in range(3):
                jax.block_until_ready(step(state, key))
        print(f"trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
