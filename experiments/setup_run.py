"""Experiment glue: config -> model -> trainer -> run.

Rework of experiments/setup_run.py (reference): flow-forward-pass budget accounting
(:33-85), logger/buffer/model construction (:88-228) and the trainer driver (:232-347)
— with hydra replaced by plain YAML + dotted CLI overrides, and a `mesh` config
section for multi-chip sharding (new; the reference is single-device).
"""
from __future__ import annotations

import datetime
import os
from typing import Optional

import jax
import jax.numpy as jnp

from fab_tpu.buffer import PrioritisedReplayBuffer
from fab_tpu.checkpoint import latest_checkpoint
from fab_tpu.flows import data_dependent_init, make_realnvp
from fab_tpu.model import FABModel
from fab_tpu.parallel.mesh import activate_mesh, make_mesh
from fab_tpu.sampling import HamiltonianMonteCarlo, Metropolis
from fab_tpu.train import (
    PrioritisedBufferTrainer,
    Trainer,
    make_optimizer,
)
from fab_tpu.utils.logging import CSVLogger, ListLogger
from fab_tpu.utils.training import ConfigDict, get_latest_checkpoint_dir

ALPHA_DIV_TARGET_LOSSES = ("fab_alpha_div",)


def get_n_iterations(
    n_training_iter: Optional[int],
    n_flow_forward_pass: Optional[int],
    batch_size: int,
    loss_type: str,
    n_transition_operator_inner_steps: int,
    n_intermediate_ais_dist: int,
    transition_operator_type: str,
    use_buffer: bool,
    min_buffer_length: Optional[int] = None,
) -> int:
    """Convert a flow-forward-pass budget into iterations (setup_run.py:33-85).

    One AIS pass costs n_inner * n_dist + 1 flow evaluations; buffer runs add one
    extra flow eval per iteration (replay log-prob) plus the buffer-init cost.
    """
    assert bool(n_training_iter) != bool(n_flow_forward_pass)
    if n_training_iter:
        return n_training_iter
    if loss_type.startswith("flow") or loss_type.startswith("target"):
        n_iter = n_flow_forward_pass // batch_size
    else:
        n_flow_eval_per_ais_forward = (
            n_transition_operator_inner_steps * n_intermediate_ais_dist + 1
        )
        if use_buffer:
            buffer_init_flow_eval = n_flow_eval_per_ais_forward * min_buffer_length
            n_flow_eval_per_iter = (n_flow_eval_per_ais_forward + 1) * batch_size
        else:
            buffer_init_flow_eval = 0
            n_flow_eval_per_iter = n_flow_eval_per_ais_forward * batch_size
        n_iter = int(
            (n_flow_forward_pass - buffer_init_flow_eval) / n_flow_eval_per_iter
        )
    print(f"{n_iter} iter for {n_flow_forward_pass} flow forward passes")
    return n_iter


def setup_logger(cfg: ConfigDict, save_path: str):
    if hasattr(cfg.logger, "pandas_logger"):
        return CSVLogger(
            save_path=os.path.join(save_path, "logging_hist.csv"),
            save_period=cfg.logger.pandas_logger.save_period,
        )
    if hasattr(cfg.logger, "list_logger"):
        return ListLogger(
            save=True, save_path=os.path.join(save_path, "logging_hist.pkl")
        )
    raise ValueError("No logger specified (pandas_logger or list_logger).")


def setup_mesh(cfg: ConfigDict) -> None:
    """Activate the ("data", "model") device mesh if requested (new vs reference)."""
    mesh_cfg = cfg.get("mesh")
    if not mesh_cfg or not mesh_cfg.get("enable", True):
        return
    if len(jax.devices()) == 1 and (mesh_cfg.get("n_model", 1) == 1):
        return  # single chip: plain single-device programs
    mesh = make_mesh(mesh_cfg.get("n_data"), mesh_cfg.get("n_model", 1))
    activate_mesh(mesh)
    print(f"Activated mesh {mesh}")


def setup_model(cfg: ConfigDict, target) -> FABModel:
    """Build flow + transition operator + FABModel (setup_run.py:151-228)."""
    dim = cfg.target.dim
    if cfg.flow.get("resampled_base"):
        from fab_tpu.flows.factory import make_resampled_realnvp

        flow = make_resampled_realnvp(
            dim,
            n_flow_layers=cfg.flow.n_layers,
            layer_nodes_per_dim=cfg.flow.layer_nodes_per_dim,
            act_norm=cfg.flow.act_norm,
            init_mode=cfg.flow.get("init_mode", "he_normal"),
        )
    elif cfg.flow.get("use_snf"):
        from fab_tpu.flows.snf import make_snf_model

        snf_cfg = cfg.flow.snf
        flow = make_snf_model(
            dim,
            target_log_prob=target.log_prob,
            n_flow_layers=cfg.flow.n_layers,
            layer_nodes_per_dim=cfg.flow.layer_nodes_per_dim,
            act_norm=cfg.flow.act_norm,
            it_snf_layer=snf_cfg.get("it_snf_layer", 2),
            mh_prop_scale=snf_cfg.get("step_size", 0.1),
            mh_steps=snf_cfg.get("num_steps", 10),
            init_mode=cfg.flow.get("init_mode", "he_normal"),
        )
    else:
        flow = make_realnvp(
            dim,
            n_flow_layers=cfg.flow.n_layers,
            layer_nodes_per_dim=cfg.flow.layer_nodes_per_dim,
            act_norm=cfg.flow.act_norm,
            scale_cap=cfg.flow.get("scale_cap", 0.0),
            fused_coupling=bool(cfg.flow.get("fused_coupling", False)),
            init_mode=cfg.flow.get("init_mode", "he_normal"),
        )
    to_cfg = cfg.fab.transition_operator
    if to_cfg.type == "hmc":
        transition_operator = HamiltonianMonteCarlo(
            n_ais_intermediate_distributions=cfg.fab.n_intermediate_distributions,
            n_outer=1,
            n_leapfrog=to_cfg.n_inner_steps,
            epsilon=to_cfg.init_step_size,
            target_p_accept=to_cfg.get("target_p_accept", 0.65),
        )
    elif to_cfg.type == "metropolis":
        # Reference passes init_step_size as both min and max (constant row,
        # setup_run.py:204-205) and tune_step_size toggles adjustment.
        transition_operator = Metropolis(
            n_ais_intermediate_distributions=cfg.fab.n_intermediate_distributions,
            n_updates=to_cfg.n_inner_steps,
            max_step_size=to_cfg.init_step_size,
            min_step_size=to_cfg.init_step_size,
            adjust_step_size=to_cfg.get("tune_step_size", True),
            target_p_accept=to_cfg.get("target_p_accept", 0.65),
        )
    else:
        raise NotImplementedError(to_cfg.type)
    return FABModel.create(
        flow=flow,
        target=target,
        transition_operator=transition_operator,
        n_intermediate_distributions=cfg.fab.n_intermediate_distributions,
        alpha=cfg.fab.alpha,
        loss_type=cfg.fab.loss_type,
    )


def setup_precision(cfg: ConfigDict) -> None:
    """Matmul precision control (replaces the reference's use_64_bit flag).

    TPU f32 matmuls default to bf16 multiplication, which silently wrecks FAB
    training quality (measured on GMM-40: ESS 20x worse per iteration than true-f32
    CPU); 'highest' forces full f32 accumulation. The flow/LU matmuls here are tiny
    and latency-bound, so the cost is negligible.
    """
    precision = cfg.training.get("matmul_precision", "highest")
    if precision:
        jax.config.update("jax_default_matmul_precision", precision)


def setup_trainer_and_run_flow(cfg: ConfigDict, target, plotter=None):
    """Tie everything together and run training (setup_run.py:232-347)."""
    from fab_tpu.utils.training import maybe_enable_x64

    dtype = maybe_enable_x64(cfg)  # entry points call this earlier too (targets)
    setup_precision(cfg)
    setup_mesh(cfg)
    t = cfg.training
    n_iterations = get_n_iterations(
        n_training_iter=t.n_iterations,
        n_flow_forward_pass=t.n_flow_forward_pass,
        batch_size=t.batch_size,
        loss_type=cfg.fab.loss_type,
        n_transition_operator_inner_steps=cfg.fab.transition_operator.n_inner_steps,
        n_intermediate_ais_dist=cfg.fab.n_intermediate_distributions,
        transition_operator_type=cfg.fab.transition_operator.type,
        use_buffer=t.use_buffer,
        min_buffer_length=t.get("min_buffer_length"),
    )

    # %Y-%m-%d so lexical order == chronological order (run-dir "latest"
    # resolution in eval scripts and get_latest_checkpoint_dir).
    stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    save_path = os.path.join(cfg.evaluation.save_path, stamp)
    os.makedirs(save_path, exist_ok=True)
    logger = setup_logger(cfg, save_path)
    model = setup_model(cfg, target)
    optimizer = make_optimizer(t.lr, t.get("max_grad_norm"))

    key = jax.random.key(t.seed)
    use_buffer = t.use_buffer
    if use_buffer:
        if t.prioritised_buffer:
            buffer = PrioritisedReplayBuffer(
                dim=cfg.target.dim,
                max_length=t.maximum_buffer_length,
                min_sample_length=t.min_buffer_length,
            )
            trainer = PrioritisedBufferTrainer(
                model,
                optimizer,
                buffer,
                n_batches_buffer_sampling=t.n_batches_buffer_sampling,
                w_adjust_max_clip=t.get("w_adjust_max_clip"),
                logger=logger,
                plotter=plotter,
                save_path=save_path,
                dtype=dtype,
            )
        else:
            from fab_tpu.buffer import ReplayBuffer
            from fab_tpu.train import BufferTrainer

            buffer = ReplayBuffer(
                dim=cfg.target.dim,
                max_length=t.maximum_buffer_length,
                min_sample_length=t.min_buffer_length,
                temperature=float(t.get("buffer_temp", 0.0)),
            )
            trainer = BufferTrainer(
                model,
                optimizer,
                buffer,
                n_batches_buffer_sampling=t.n_batches_buffer_sampling,
                clip_ais_weights_frac=t.get("log_w_clip_frac"),
                logger=logger,
                plotter=plotter,
                save_path=save_path,
                dtype=dtype,
            )
    else:
        trainer = Trainer(
            model, optimizer, logger=logger, plotter=plotter, save_path=save_path,
            dtype=dtype,
        )

    # Resume from checkpoint if configured (setup_run.py:285-294).
    state, start_iter = None, 0
    if t.get("checkpoint_load_dir"):
        run_dir = get_latest_checkpoint_dir(t.checkpoint_load_dir)
        ckpt = latest_checkpoint(os.path.join(run_dir, "model_checkpoints")) if run_dir else None
        if ckpt:
            state, start_iter = trainer.load_state(ckpt)
            print(f"Resuming from {ckpt} at iteration {start_iter}")

    if state is None:
        key, key_init = jax.random.split(key)
        if use_buffer:
            state = trainer.init_state(key_init, batch_size=t.batch_size)
        else:
            state = trainer.init_state(key_init)
        if cfg.flow.act_norm:
            state = state._replace(
                params=dict(
                    state.params,
                    flow=data_dependent_init(
                        model.flow, state.params["flow"], key_init
                    ),
                )
            )

    state = trainer.run(
        key=key,
        n_iterations=n_iterations,
        batch_size=t.batch_size,
        eval_batch_size=cfg.evaluation.get("eval_batch_size"),
        n_eval=cfg.evaluation.get("n_eval"),
        n_plot=cfg.evaluation.get("n_plots"),
        n_checkpoints=cfg.evaluation.get("n_checkpoints"),
        tlimit=t.get("tlimit"),
        state=state,
        start_iter=start_iter,
        log_every=t.get("log_every", 1),
    )
    return trainer, state
