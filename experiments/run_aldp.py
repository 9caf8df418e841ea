"""ALDP training entry point.

Rework of experiments/aldp/train.py (reference's self-contained argparse script,
:24-482) on top of the shared fab-tpu trainers: FAB + prioritised buffer on the
60-D internal-coordinate Boltzmann target, with periodic ALDP evaluation
(Ramachandran/marginal KLDs against an MCMC-generated test set) and chirality
monitoring.

Usage:
    python experiments/run_aldp.py --config experiments/configs/aldp.yaml \
        [training.max_iter=100 ...]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fab_tpu.buffer import PrioritisedReplayBuffer
from fab_tpu.sampling import HamiltonianMonteCarlo, create_point
from fab_tpu.train import PrioritisedBufferTrainer, Trainer, make_optimizer
from fab_tpu.utils.aldp_eval import evaluate_aldp
from fab_tpu.utils.logging import CSVLogger
from fab_tpu.utils.training import apply_overrides, load_config, maybe_enable_x64

from experiments.make_aldp_model import make_aldp_model


def generate_test_set(target, key, n_samples=10_000, n_steps=400, n_chains=None):
    """MCMC ground-truth-ish test set: long HMC at the target from the minimised
    structure (replaces the reference's MD validation data, aldp train.py data/val)."""
    if n_chains is None:
        # Enough chains that post-burn-in thinning covers n_samples without tiling.
        n_collect_chunks = max((n_steps // 20) - (n_steps // 20) // 2, 1)
        # 2x headroom: D-form rows are dropped by the chirality filter below
        # (long chains can spend ~half their mass in the mirror basin).
        n_chains = max(512, 2 * -(-n_samples // n_collect_chunks))
    op = HamiltonianMonteCarlo(
        n_ais_intermediate_distributions=1, n_outer=1, n_leapfrog=10, epsilon=0.05
    )
    state = op.init_state(target.dim)
    z0, _ = target.transform.cartesian_to_flow(jnp.asarray(target.ref_cartesian))
    key, key_init = jax.random.split(key)
    z = jnp.tile(z0, (n_chains, 1)) + 0.01 * jax.random.normal(
        key_init, (n_chains, target.dim)
    )
    log_q = lambda x: jnp.zeros(x.shape[:-1])  # beta=1: pure target
    point = create_point(z, log_q, target.log_prob, with_grad=True)
    mask = jnp.ones(n_chains, bool)

    @jax.jit
    def sweep(point, state, key):
        return op.transition(
            state, key, point, jnp.asarray(1.0), jnp.asarray(0), log_q,
            target.log_prob, 1.0, mask, True,
        )

    # Run sweeps in on-device chunks (one dispatch per chunk — per-sweep host
    # round-trips cost minutes through a remote-device tunnel).
    chunk = 20

    @jax.jit
    def sweep_chunk(point, state, key):
        def body(carry, key_t):
            point, state = carry
            point, state, _ = op.transition(
                state, key_t, point, jnp.asarray(1.0), jnp.asarray(0), log_q,
                target.log_prob, 1.0, mask, True,
            )
            return (point, state), None

        (point, state), _ = jax.lax.scan(
            body, (point, state), jax.random.split(key, chunk)
        )
        return point, state

    samples = []
    n_chunks = max(n_steps // chunk, 1)
    burn_in_chunks = n_chunks // 2
    for c in range(n_chunks):
        key, sub = jax.random.split(key)
        point, state = sweep_chunk(point, state, sub)
        if c >= burn_in_chunks:
            samples.append(np.asarray(point.x))
    data = np.concatenate(samples)
    # Keep only the canonical (L-form) chirality basin: the reference's
    # validation data is an MD trajectory of L-alanine dipeptide, while long
    # HMC chains here can hop into the mirror (D-form) basin (observed ~56%
    # D-form), and a racemic test set saturates kld_phi/kld_ram for every
    # single-chirality flow. Matches the spirit of the reference's
    # filter_chirality (aldp/train.py:228-243) applied to evaluation data.
    from fab_tpu.utils.aldp_eval import chirality_scale_shift, filter_chirality

    scale, shift = chirality_scale_shift(target.transform)
    keep = np.asarray(
        filter_chirality(jnp.asarray(data), scale=scale, shift=shift)
    )
    # Guard like the reference's train-time filter (aldp/train.py:230: only
    # filter when mean(ind_L) > 0.1): if the chains settled entirely in the
    # D-form basin, filtering would leave 0 rows and the tile fallback below
    # would divide by zero.
    if keep.mean() <= 0.1:
        raise RuntimeError(
            f"test-set generation: only {keep.mean():.1%} of HMC samples are "
            "L-form; refusing to build an (almost) empty L-only test set. "
            "Regenerate with a different seed or more chains."
        )
    if keep.mean() < 0.999:
        print(
            f"test set: dropping {int((~keep).sum())}/{len(keep)} D-form rows "
            f"(frac_L={keep.mean():.3f})"
        )
        data = data[keep]
    data = data[:n_samples]
    if data.shape[0] < n_samples:
        reps = -(-n_samples // data.shape[0])
        data = np.tile(data, (reps, 1))[:n_samples]
    return data


def run_ml_training(cfg, model, target, z_train, z_test, key):
    """Forward-KL (maximum-likelihood) training loop on target-distributed data."""
    import optax

    t = cfg.training
    save_root = t.save_root
    params = model.init(key)
    optimizer = make_optimizer(
        t.learning_rate,
        t.get("max_grad_norm"),
        optimizer=t.get("optimizer", "adam"),
        schedule=t.get("lr_schedule"),
        total_steps=t.max_iter,
        warmup_steps=int(t.get("warmup_iter", 0)),
        decay_rate=float(t.get("lr_decay_rate", 0.1)),
        restart_period=t.get("lr_restart_period"),
    )
    opt_state = optimizer.init(params["flow"])
    n_train = z_train.shape[0]
    batch_size = t.batch_size

    @jax.jit
    def step(flow_params, opt_state, key):
        idx = jax.random.randint(key, (batch_size,), 0, n_train)
        key_lq = jax.random.fold_in(key, 0x11A7)  # SNF log_prob noise (ignored else)
        loss, grads = jax.value_and_grad(
            lambda fp: model.forward_kl_loss({"flow": fp}, z_train[idx], key_lq)
        )(flow_params)
        # NaN-guarded update (train.py pattern): skip the step on non-finite grads.
        finite = jnp.isfinite(loss) & jnp.all(
            jnp.asarray([jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)])
        )
        updates, new_opt_state = optimizer.update(grads, opt_state, flow_params)
        new_flow_params = optax.apply_updates(flow_params, updates)
        flow_params = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old), new_flow_params, flow_params
        )
        opt_state = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old), new_opt_state, opt_state
        )
        return flow_params, opt_state, loss

    flow_params = params["flow"]
    for i in range(t.max_iter):
        key, sub = jax.random.split(key)
        flow_params, opt_state, loss = step(flow_params, opt_state, sub)
        if i % t.get("log_every", 100) == 0:
            print(f"ml iter {i}: loss {float(loss):.4f}")
    params = dict(params, flow=flow_params)

    from fab_tpu.checkpoint import save_checkpoint

    save_checkpoint(
        os.path.join(
            save_root, "model_checkpoints", f"iter_{t.max_iter}", "state.pkl"
        ),
        {"params": params},
    )
    n_eval_samples = int(t.get("final_eval_samples", 10_000))
    zs = []
    for i in range(0, n_eval_samples, 1000):
        key, sub = jax.random.split(key)
        zs.append(np.asarray(model.flow.sample(params["flow"], sub, 1000)))
    metrics = evaluate_aldp(
        target,
        np.concatenate(zs)[:n_eval_samples],
        np.asarray(z_test),
        iteration=t.max_iter,
        metric_dir=os.path.join(save_root, "metrics"),
        plot_dir=os.path.join(save_root, "plots"),
    )
    print({k: round(float(v), 5) for k, v in metrics.items()})


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="experiments/configs/aldp.yaml")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    cfg = apply_overrides(load_config(args.config), args.overrides)
    maybe_enable_x64(cfg)

    jax.config.update(
        "jax_default_matmul_precision",
        cfg.training.get("matmul_precision", "highest"),
    )
    model, target = make_aldp_model(cfg)
    t = cfg.training
    save_root = cfg.training.save_root
    os.makedirs(save_root, exist_ok=True)
    logger = CSVLogger(
        save_path=os.path.join(save_root, "logging_hist.csv"),
        save_period=t.get("log_iter", 100),
    )
    optimizer = make_optimizer(
        t.learning_rate,
        t.get("max_grad_norm"),
        optimizer=t.get("optimizer", "adam"),
        schedule=t.get("lr_schedule"),
        total_steps=t.max_iter,
        warmup_steps=int(t.get("warmup_iter", 0)),
        decay_rate=float(t.get("lr_decay_rate", 0.1)),
        restart_period=t.get("lr_restart_period"),
    )

    key = jax.random.key(t.seed)
    key, key_test = jax.random.split(key)
    test_path = os.path.join(save_root, "test_set.npy")
    if os.path.exists(test_path):
        z_test = np.load(test_path)
    else:
        print("Generating MCMC test set ...")
        z_test = generate_test_set(
            target, key_test, n_samples=int(t.get("n_test_samples", 10_000)),
            n_steps=int(t.get("test_mcmc_steps", 400)),
        )
        np.save(test_path, z_test)

    batch_size = t.batch_size
    if cfg.fab.loss_type == "forward_kl":
        # Maximum-likelihood variant (reference aldp config 'ml', train.py:274-283):
        # fit the flow on target-distributed data. The reference uses MD training
        # data; we train on an MCMC-generated set disjoint from the test set.
        train_path = os.path.join(save_root, "train_set.npy")
        if os.path.exists(train_path):
            z_train = np.load(train_path)
        else:
            print("Generating MCMC training set ...")
            key, key_train = jax.random.split(key)
            z_train = generate_test_set(
                target, key_train,
                n_samples=int(t.get("n_train_samples", 100_000)),
                n_steps=int(t.get("test_mcmc_steps", 400)),
            )
            np.save(train_path, z_train)
        run_ml_training(cfg, model, target, jnp.asarray(z_train), z_test, key)
        return

    rb = cfg.training.replay_buffer
    use_buffer = rb is not None and rb.get("type") == "prioritised"
    if use_buffer:
        buffer = PrioritisedReplayBuffer(
            dim=target.dim,
            max_length=rb.max_length * batch_size,
            min_sample_length=rb.min_length * batch_size,
        )
        trainer = PrioritisedBufferTrainer(
            model, optimizer, buffer,
            n_batches_buffer_sampling=rb.n_updates,
            w_adjust_max_clip=rb.get("max_adjust_w_clip"),
            logger=logger,
            save_path=save_root,
        )
    else:
        trainer = Trainer(model, optimizer, logger=logger, save_path=save_root)

    # Resume: latest checkpoint under save_root + CSV-log truncation (the
    # reference's resume path, experiments/aldp/train.py:161-195).
    state, start_iter = None, 0
    if t.get("resume", True):
        from fab_tpu.checkpoint import latest_checkpoint

        ckpt = latest_checkpoint(os.path.join(save_root, "model_checkpoints"))
        if ckpt:
            state, start_iter = trainer.load_state(ckpt)
            logger.resume_from(start_iter)
            print(f"Resuming from {ckpt} at iteration {start_iter}")
    if state is None:
        key, key_init = jax.random.split(key)
        if use_buffer:
            state = trainer.init_state(key_init, batch_size=batch_size)
        else:
            state = trainer.init_state(key_init)

    n_iter = t.max_iter
    state = trainer.run(
        key=key,
        n_iterations=n_iter,
        batch_size=batch_size,
        eval_batch_size=t.get("eval_batch_size", batch_size),
        n_eval=t.get("n_eval", 5),
        n_checkpoints=t.get("n_checkpoints", 2),
        tlimit=t.get("tlimit"),
        start_iter=start_iter,
        state=state,
        log_every=t.get("log_every", 10),
    )

    # Final ALDP-specific evaluation: flow samples vs MCMC test set.
    print("Final ALDP evaluation ...")
    n_eval_samples = int(t.get("final_eval_samples", 10_000))
    zs = []
    chunk = 1000
    for i in range(0, n_eval_samples, chunk):
        key, sub = jax.random.split(key)
        zs.append(np.asarray(model.flow.sample(state.params["flow"], sub, chunk)))
    z_sample = np.concatenate(zs)[:n_eval_samples]
    # Label metrics with the actually-reached iteration (tlimit may stop early):
    # the trainer checkpoints at the stop iteration, so the latest iter_N is it.
    from fab_tpu.checkpoint import latest_checkpoint

    ckpt = latest_checkpoint(os.path.join(save_root, "model_checkpoints"))
    try:
        reached = int(os.path.basename(os.path.dirname(ckpt)).split("_")[-1])
    except (TypeError, ValueError, AttributeError):
        reached = n_iter
    metrics = evaluate_aldp(
        target,
        z_sample,
        z_test,
        iteration=reached,  # the actually-reached iteration (tlimit may stop early)
        metric_dir=os.path.join(save_root, "metrics"),
        plot_dir=os.path.join(save_root, "plots"),
    )
    print({k: round(float(v), 5) for k, v in metrics.items()})


if __name__ == "__main__":
    main()
