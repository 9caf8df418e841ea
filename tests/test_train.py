"""Trainer tests: plain + prioritised-buffer loops, NaN guards, checkpointing,
and experiment-entry smoke runs (the analogue of the reference's *_fast.yaml
local-scale e2e checks, SURVEY §4)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fab_tpu.buffer import PrioritisedReplayBuffer
from fab_tpu.flows import make_realnvp
from fab_tpu.model import FABModel
from fab_tpu.sampling import HamiltonianMonteCarlo, Metropolis
from fab_tpu.targets import GMM, ManyWellEnergy
from fab_tpu.train import (
    PrioritisedBufferTrainer,
    Trainer,
    guarded_update,
    make_optimizer,
)
from fab_tpu.utils.logging import ListLogger


def small_gmm_model(loss_type="fab_alpha_div"):
    target = GMM(
        dim=2, n_mixes=4, loc_scaling=5.0,
        true_expectation_estimation_n_samples=10_000,
    )
    flow = make_realnvp(2, n_flow_layers=2, layer_nodes_per_dim=8, act_norm=False)
    op = Metropolis(n_ais_intermediate_distributions=1, n_updates=1,
                    max_step_size=2.0, min_step_size=2.0)
    return FABModel.create(
        flow, target, transition_operator=op, n_intermediate_distributions=1,
        loss_type=loss_type,
    )


def test_guarded_update_skips_nonfinite():
    opt = make_optimizer(0.1, 1.0)
    params = {"w": jnp.ones(3)}
    opt_state = opt.init(params)
    bad_grads = {"w": jnp.array([jnp.nan, 1.0, 1.0])}
    new_params, new_opt_state, gnorm, ok = guarded_update(
        opt, bad_grads, opt_state, params, jnp.asarray(1.0)
    )
    assert not bool(ok)
    np.testing.assert_allclose(new_params["w"], params["w"])  # unchanged
    good_grads = {"w": jnp.ones(3)}
    new_params, _, _, ok = guarded_update(
        opt, good_grads, opt_state, params, jnp.asarray(1.0)
    )
    assert bool(ok)
    assert not np.allclose(new_params["w"], params["w"])
    # Non-finite loss also skips.
    _, _, _, ok = guarded_update(
        opt, good_grads, opt_state, params, jnp.asarray(jnp.nan)
    )
    assert not bool(ok)


def test_plain_trainer_improves(key, tmp_path):
    model = small_gmm_model()
    logger = ListLogger()
    trainer = Trainer(
        model, make_optimizer(5e-3, 100.0), logger=logger,
        save_path=str(tmp_path),
    )
    state = trainer.run(
        key, n_iterations=60, batch_size=128, eval_batch_size=256, n_eval=2,
        n_checkpoints=2, log_every=1,
    )
    losses = logger.history["loss"]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    assert "eval_ess_flow" in logger.history
    assert int(state.step) == 60
    # Checkpoints at linspace(1, 60, 2) = {1, 60}; latest is loadable.
    from fab_tpu.checkpoint import latest_checkpoint

    ckpt = latest_checkpoint(os.path.join(str(tmp_path), "model_checkpoints"))
    assert ckpt and "iter_60" in ckpt
    state2, it = trainer.load_state(ckpt)
    assert it == 60
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state2.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )


def test_plain_trainer_reverse_kl(key, tmp_path):
    model = small_gmm_model("flow_reverse_kl")
    logger = ListLogger()
    trainer = Trainer(model, make_optimizer(5e-3, 100.0), logger=logger,
                      save_path=str(tmp_path))
    trainer.run(key, n_iterations=30, batch_size=128, log_every=1, save=False)
    assert np.isfinite(logger.history["loss"]).all()


def test_buffer_trainer_runs_and_adjusts(key, tmp_path):
    target = ManyWellEnergy(dim=4)
    flow = make_realnvp(4, n_flow_layers=3, layer_nodes_per_dim=8, act_norm=False)
    op = HamiltonianMonteCarlo(
        n_ais_intermediate_distributions=2, n_leapfrog=3, epsilon=1.0
    )
    model = FABModel.create(
        flow, target, transition_operator=op, n_intermediate_distributions=2,
        loss_type="fab_alpha_div",
    )
    buffer = PrioritisedReplayBuffer(dim=4, max_length=1024, min_sample_length=256)
    logger = ListLogger()
    trainer = PrioritisedBufferTrainer(
        model, make_optimizer(1e-3, 100.0), buffer,
        n_batches_buffer_sampling=2, w_adjust_max_clip=10.0, logger=logger,
        save_path=str(tmp_path),
    )
    state = trainer.init_state(key, batch_size=64)
    assert int(state.buffer_state.n_added) >= 256
    state = trainer.run(
        key, n_iterations=40, batch_size=64, eval_batch_size=128, n_eval=2,
        n_checkpoints=2, log_every=1,
    )
    # Replay losses can legitimately spike on extreme buffer rows (the reference
    # behaves the same — it only skips *non-finite* losses); the guard must keep
    # training healthy: most steps apply, and the run ends with finite losses.
    losses = np.asarray(logger.history["loss"])
    assert np.isfinite(losses[-5:]).all()
    assert np.mean(logger.history["update_applied"]) > 0.4
    assert "w_adjust_mean" in logger.history
    # Dual-target eval keys present (train_with_prioritised_buffer.py:96-99).
    assert "eval_ess_ais_p_target" in logger.history
    assert "eval_ess_ais_min_var_target" in logger.history
    # Buffer priorities have been adjusted (not all zero-initialised).
    lw = np.asarray(state.buffer_state.log_w)
    assert np.std(lw[np.isfinite(lw)]) > 0
    # Checkpoint roundtrip including buffer: latest checkpoint is iter 40 = final.
    from fab_tpu.checkpoint import latest_checkpoint

    ckpt = latest_checkpoint(os.path.join(str(tmp_path), "model_checkpoints"))
    state2, it = trainer.load_state(ckpt)
    assert it == 40
    np.testing.assert_allclose(np.asarray(state2.buffer_state.log_w), lw)


def test_sample_filter_in_buffer_trainer(key, tmp_path):
    """A model-level sample_filter (ALDP chirality analogue) masks filtered AIS
    rows to -inf priority before buffer-add and logs the pass fraction."""
    import dataclasses

    model = small_gmm_model()

    def half_plane_filter(x, mask):
        keep = x[:, 0] < 0.0
        frac = jnp.sum(keep & mask) / jnp.maximum(jnp.sum(mask), 1)
        return jnp.where(frac > 0.1, mask & keep, mask)

    model = dataclasses.replace(model, sample_filter=half_plane_filter)
    buffer = PrioritisedReplayBuffer(dim=2, max_length=512, min_sample_length=128)
    logger = ListLogger()
    trainer = PrioritisedBufferTrainer(
        model, make_optimizer(1e-3, 100.0), buffer,
        n_batches_buffer_sampling=2, w_adjust_max_clip=10.0, logger=logger,
        save_path=str(tmp_path),
    )
    state = trainer.init_state(key, batch_size=64)
    n_init = int(state.buffer_state.n_added)
    state = trainer.run(key, n_iterations=8, batch_size=64, log_every=1, save=False)
    fracs = np.asarray(logger.history["frac_filter_pass"])
    assert np.isfinite(fracs).all() and (fracs <= 1.0).all()
    # Rows added after init with x[0] >= 0 must carry -inf priority (dead rows).
    bs = state.buffer_state
    added = np.arange(n_init, n_init + 8 * 64) % buffer.max_length
    x0 = np.asarray(bs.x)[added, 0]
    lw = np.asarray(bs.log_w)[added]
    assert not np.isfinite(lw[x0 >= 0]).any()
    # The filter passed some rows every iteration (finite priorities exist).
    assert np.isfinite(lw[x0 < 0]).any()
    # The filter also gates the plain fab_alpha_div loss path.
    loss, _ = model.loss_and_info(state.params, key, 64)
    assert np.isfinite(float(loss))


def test_f64_training(key, tmp_path):
    """use_64_bit path: params/buffer in f64, one buffered step trains finitely
    (reference trains every paper config in double, gmm.yaml use_64_bit)."""
    with jax.enable_x64():
        model = small_gmm_model()
        buffer = PrioritisedReplayBuffer(dim=2, max_length=512, min_sample_length=128)
        trainer = PrioritisedBufferTrainer(
            model, make_optimizer(1e-3, 100.0), buffer,
            n_batches_buffer_sampling=2, logger=ListLogger(),
            save_path=str(tmp_path), dtype=jnp.float64,
        )
        state = trainer.init_state(key, batch_size=64)
        assert all(
            x.dtype == jnp.float64 for x in jax.tree.leaves(state.params["flow"])
        )
        assert state.buffer_state.x.dtype == jnp.float64
        step = trainer.make_train_step(batch_size=64)
        state, info = step(state, key)
        assert info["loss"].dtype == jnp.float64
        assert bool(jnp.isfinite(info["loss"]))


@pytest.mark.slow
def test_gmm_experiment_entry_smoke(tmp_path, monkeypatch):
    """Drive the CLI entry end-to-end with a tiny config (fast-config pattern)."""
    monkeypatch.chdir(tmp_path)
    import sys

    sys.path.insert(0, "/root/repo")
    from experiments.run_gmm import main

    cfg_overrides = [
        "training.n_iterations=5",
        "training.n_flow_forward_pass=null",
        "target.true_expectation_n_samples=10000",
        "flow.n_layers=2",
        "flow.layer_nodes_per_dim=4",
        "evaluation.n_plots=1",
        "evaluation.n_eval=1",
        "evaluation.n_checkpoints=1",
        "evaluation.eval_batch_size=128",
        f"evaluation.save_path={tmp_path}/results/",
        "training.batch_size=64",
    ]
    main(["--config", "/root/repo/experiments/configs/gmm_fast.yaml"] + cfg_overrides)
    # Logging history pickle written.
    run_dirs = os.listdir(f"{tmp_path}/results")
    assert run_dirs
    contents = os.listdir(f"{tmp_path}/results/{run_dirs[0]}")
    assert "logging_hist.pkl" in contents
    assert "model_checkpoints" in contents and "plots" in contents


@pytest.mark.slow
def test_many_well_experiment_entry_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import sys

    sys.path.insert(0, "/root/repo")
    from experiments.run_many_well import main

    cfg_overrides = [
        "target.dim=4",
        "training.n_iterations=3",
        "training.batch_size=32",
        "training.maximum_buffer_length=512",
        "training.min_buffer_length=96",
        "flow.n_layers=2",
        "flow.layer_nodes_per_dim=4",
        "fab.transition_operator.n_inner_steps=2",
        "fab.n_intermediate_distributions=2",
        "evaluation.n_plots=1",
        "evaluation.n_eval=1",
        "evaluation.n_checkpoints=1",
        "evaluation.eval_batch_size=64",
        f"evaluation.save_path={tmp_path}/results/",
    ]
    main(
        ["--config", "/root/repo/experiments/configs/many_well_fast.yaml"]
        + cfg_overrides
    )
    run_dirs = os.listdir(f"{tmp_path}/results")
    assert run_dirs


def test_orbax_checkpoint_roundtrip(tmp_path, key):
    """Orbax backend: sharded-array save/restore across a mesh (multi-host path)."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fab_tpu.checkpoint import load_checkpoint_orbax, save_checkpoint_orbax
    from fab_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(len(jax.devices()), 1)
    sharding = NamedSharding(mesh, P("data"))
    state = {
        "params": {"w": jax.random.normal(key, (16, 4))},
        "buffer": jax.device_put(jnp.arange(32.0).reshape(32, 1), sharding),
        "step": jnp.asarray(7),
    }
    path = str(tmp_path / "ckpt")
    save_checkpoint_orbax(path, state)

    # Restore re-sharded onto the mesh.
    target = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(
            a.shape, a.dtype,
            sharding=a.sharding if hasattr(a, "sharding") else None,
        ),
        state,
    )
    restored = load_checkpoint_orbax(path, target=target)
    np.testing.assert_array_equal(
        np.asarray(restored["buffer"]), np.asarray(state["buffer"])
    )
    np.testing.assert_allclose(
        np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
    )
    assert int(restored["step"]) == 7
    assert restored["buffer"].sharding.is_equivalent_to(sharding, 2)


def test_make_optimizer_schedules(key):
    """Optimizer/scheduler matrix (reference aldp/train.py:85-118)."""
    import optax

    from fab_tpu.train import make_optimizer

    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.ones((4,))}
    for opt_name in ["adam", "adamax"]:
        for schedule in [None, "cosine", "cosine_restart", "exponential"]:
            opt = make_optimizer(
                1e-3, 10.0, optimizer=opt_name, schedule=schedule,
                total_steps=100, warmup_steps=10,
            )
            state = opt.init(params)
            p = params
            for _ in range(3):
                updates, state = opt.update(grads, state, p)
                p = optax.apply_updates(p, updates)
            assert bool(jnp.all(jnp.isfinite(p["w"]))), (opt_name, schedule)

    # Warmup actually ramps: the first step's LR is ~lr/warmup, not lr.
    opt = make_optimizer(1.0, schedule="cosine", total_steps=100, warmup_steps=10)
    state = opt.init(params)
    updates, _ = opt.update(grads, state, params)
    assert float(jnp.abs(updates["w"]).max()) < 0.5

    import pytest

    with pytest.raises(ValueError):
        make_optimizer(1e-3, optimizer="sgdlol")
    with pytest.raises(ValueError):
        make_optimizer(1e-3, schedule="nonsense", total_steps=10)


def test_csv_logger_resume_truncation(tmp_path):
    from fab_tpu.utils.logging import CSVLogger

    path = str(tmp_path / "hist.csv")
    logger = CSVLogger(save_path=path, save_period=1)
    for step in [2, 4, 6, 8]:
        logger.write({"step": step, "loss": float(step)})
    logger.close()

    resumed = CSVLogger(save_path=path, save_period=1)
    resumed.resume_from(5)
    assert [float(r["step"]) for r in resumed.rows] == [2.0, 4.0]
    resumed.write({"step": 6, "loss": -1.0})
    resumed.close()
    import csv as csv_mod

    with open(path) as f:
        rows = list(csv_mod.DictReader(f))
    assert len(rows) == 3 and float(rows[-1]["loss"]) == -1.0
