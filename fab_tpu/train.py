"""Trainers: plain FAB training and prioritised-buffer FAB training.

Rework of fab/train.py:17-160 and fab/train_with_prioritised_buffer.py:20-255. The
per-iteration work — AIS pass, loss, gradients, NaN-guarded optimiser update, and (for
the buffer trainer) buffer add/sample/replay-gradient-steps/priority-adjustment — is a
single donated jit-compiled program; the Python loop only schedules, logs and
checkpoints. Under an active mesh (fab_tpu/parallel), the same programs shard the
particle axis across devices with params replicated.

NaN-robustness (SURVEY §5): the reference skips optimiser steps on non-finite loss or
grad norm (train.py:102-113, train_with_prioritised_buffer.py:172-181); here the
update is applied through a jnp.where select on an all-finite predicate, keeping the
step a single branch-free XLA program.
"""
from __future__ import annotations

import os
import pathlib
from time import time
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fab_tpu import losses as losses_lib
from fab_tpu.buffer import PrioritisedBufferState, PrioritisedReplayBuffer
from fab_tpu.checkpoint import load_checkpoint, save_checkpoint
from fab_tpu.flows.base import flow_log_prob
from fab_tpu.model import FABModel, format_transition_info
from fab_tpu.parallel.mesh import constrain_batch
from fab_tpu.typing import Array
from fab_tpu.utils.logging import ListLogger, Logger

Plotter = Callable[[FABModel, Any, jax.Array], list]


class TrainState(NamedTuple):
    params: Any  # {"flow": ..., "transition": ...}
    opt_state: Any
    step: Array  # scalar int32


def _all_finite(tree) -> Array:
    leaves = jax.tree.leaves(tree)
    ok = jnp.asarray(True)
    for leaf in leaves:
        ok = ok & jnp.all(jnp.isfinite(leaf))
    return ok


def _select_tree(pred: Array, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def guarded_update(
    optimizer: optax.GradientTransformation,
    grads,
    opt_state,
    flow_params,
    loss: Array,
) -> Tuple[Any, Any, Array, Array]:
    """Apply an optimiser update unless loss/grads are non-finite.

    Returns (new_flow_params, new_opt_state, grad_norm, applied?). Mirrors the skip
    logic of fab/train.py:100-113 as a branch-free select.
    """
    grad_norm = optax.global_norm(grads)
    ok = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
    # Scrub non-finite grads so the optimiser state update cannot be poisoned even on
    # skipped steps (the select below discards the bogus update anyway).
    safe_grads = jax.tree.map(lambda g: jnp.nan_to_num(g), grads)
    updates, new_opt_state = optimizer.update(safe_grads, opt_state, flow_params)
    new_flow_params = optax.apply_updates(flow_params, updates)
    ok = ok & _all_finite(updates)
    return (
        _select_tree(ok, new_flow_params, flow_params),
        _select_tree(ok, new_opt_state, opt_state),
        grad_norm,
        ok,
    )


def make_optimizer(
    lr: float,
    max_gradient_norm: Optional[float] = None,
    optimizer: str = "adam",
    schedule: Optional[str] = None,
    total_steps: Optional[int] = None,
    warmup_steps: int = 0,
    decay_rate: float = 0.1,
    restart_period: Optional[int] = None,
) -> optax.GradientTransformation:
    """Adam/adamax with global-norm clipping and optional LR schedule.

    Mirrors the reference's optimizer/scheduler matrix (torch.optim.Adam +
    clip_grad_norm_, fab/train.py:104-105; adam/adamax with exponential / cosine /
    cosine-warm-restart schedules + linear warmup, experiments/aldp/train.py:85-118).

    schedule: None (constant) | 'cosine' | 'cosine_restart' | 'exponential'.
    ``total_steps`` is required for scheduled LRs; ``decay_rate`` is the end/start LR
    ratio for cosine ('alpha') and exponential; ``restart_period`` the cosine-restart
    cycle length (defaults to total_steps // 4).
    """
    lr = float(lr)
    if schedule:
        assert total_steps is not None, "scheduled LR needs total_steps"
        if schedule == "cosine":
            main = optax.cosine_decay_schedule(
                lr, max(total_steps - warmup_steps, 1), alpha=float(decay_rate)
            )
        elif schedule == "cosine_restart":
            period = int(restart_period or max(total_steps // 4, 1))
            main = optax.join_schedules(
                [
                    optax.cosine_decay_schedule(lr, period, alpha=float(decay_rate))
                    for _ in range(-(-total_steps // period))
                ],
                boundaries=[period * (i + 1) for i in range(total_steps // period)],
            )
        elif schedule == "exponential":
            # lr(step) = lr * decay_rate ** (step / transition_steps): the full
            # decay_rate factor is reached at the end of training.
            main = optax.exponential_decay(
                lr, max(total_steps - warmup_steps, 1), float(decay_rate)
            )
        else:
            raise ValueError(f"unknown schedule {schedule!r}")
        if warmup_steps > 0:
            learning_rate = optax.join_schedules(
                [optax.linear_schedule(0.0, lr, warmup_steps), main],
                boundaries=[warmup_steps],
            )
        else:
            learning_rate = main
    elif warmup_steps > 0:
        learning_rate = optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup_steps),
             optax.constant_schedule(lr)],
            boundaries=[warmup_steps],
        )
    else:
        learning_rate = lr

    steps = []
    # float() casts guard against YAML parsing "1e-4" as a string.
    if max_gradient_norm is not None:
        steps.append(optax.clip_by_global_norm(float(max_gradient_norm)))
    if optimizer == "adamax":
        steps.append(optax.adamax(learning_rate))
    elif optimizer == "adam":
        steps.append(optax.adam(learning_rate))
    else:
        raise ValueError(f"unknown optimizer {optimizer!r}")
    return optax.chain(*steps)


def _schedule(n_iterations: int, n_points: Optional[int]) -> set:
    if not n_points:
        return set()
    if n_points == 1:
        # np.linspace(1, n, 1) == [1]; a single checkpoint/eval belongs at the END.
        return {n_iterations}
    return set(np.linspace(1, n_iterations, n_points, dtype=int).tolist())


class Trainer:
    """Plain FAB trainer (fab/train.py:17-160): loss -> grad -> guarded step."""

    def __init__(
        self,
        model: FABModel,
        optimizer: optax.GradientTransformation,
        logger: Optional[Logger] = None,
        plotter: Optional[Plotter] = None,
        save_path: str = "",
        lr_schedule: Optional[Callable[[Array], Array]] = None,
        dtype=jnp.float32,
    ):
        self.model = model
        self.optimizer = optimizer
        self.logger = logger if logger is not None else ListLogger()
        self.plotter = plotter
        self.save_dir = save_path
        self.plots_dir = os.path.join(save_path, "plots")
        self.checkpoints_dir = os.path.join(save_path, "model_checkpoints")
        self.dtype = dtype  # param/buffer dtype (use_64_bit -> jnp.float64)
        del lr_schedule  # schedules are baked into the optax optimizer

    def init_state(self, key: jax.Array) -> TrainState:
        from fab_tpu.parallel.mesh import replicate, shard_flow_params

        params = self.model.init(key, self.dtype)
        params = dict(
            replicate(params), flow=shard_flow_params(self.model.flow, params["flow"])
        )
        return TrainState(
            params=params,
            opt_state=self.optimizer.init(params["flow"]),
            step=jnp.zeros((), jnp.int32),
        )

    def _train_step_fn(self, batch_size: int):
        model, optimizer = self.model, self.optimizer

        def train_step(state: TrainState, key: jax.Array):
            def loss_fn(params):
                return model.loss_and_info(params, key, batch_size, tune=True)

            (loss, (new_params, info)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            new_flow, new_opt_state, grad_norm, ok = guarded_update(
                optimizer, grads["flow"], state.opt_state, new_params["flow"], loss
            )
            new_params = dict(new_params, flow=new_flow)
            info = dict(info, loss=loss, grad_norm=grad_norm, update_applied=ok)
            return (
                TrainState(new_params, new_opt_state, state.step + 1),
                info,
            )

        return train_step

    def make_train_step(self, batch_size: int):
        return jax.jit(self._train_step_fn(batch_size))

    def make_scanned_train_step(self, batch_size: int, n_steps: int):
        """n_steps training iterations in ONE dispatch (lax.scan over keys).

        Amortises host->device dispatch latency — important when batches are small
        (GMM: batch 128) or the device sits behind a remote tunnel. Returns the
        final state and the LAST step's info.
        """
        step = self._train_step_fn(batch_size)

        @jax.jit
        def multi_step(state, key):
            state, infos = jax.lax.scan(
                lambda s, k: step(s, k), state, jax.random.split(key, n_steps)
            )
            return state, jax.tree.map(lambda a: a[-1], infos)

        return multi_step

    def save_checkpoint(self, state: TrainState, i: int) -> None:
        path = os.path.join(self.checkpoints_dir, f"iter_{i}", "state.pkl")
        save_checkpoint(path, state._asdict())

    def load_state(self, path: str) -> Tuple[TrainState, int]:
        raw = load_checkpoint(path)
        state = TrainState(**raw)
        return state, int(raw["step"])

    def perform_eval(
        self, state: TrainState, key: jax.Array, i: int, eval_batch_size: int,
        batch_size: int,
    ) -> None:
        eval_info = self.model.get_eval_info(
            state.params, key, eval_batch_size, batch_size, p_target=True
        )
        eval_info["step"] = i
        self.logger.write(eval_info)

    def _plots(self, state: TrainState, key: jax.Array, i: int, save: bool) -> None:
        if self.plotter is None:
            return
        import matplotlib.pyplot as plt

        figures = self.plotter(self.model, state.params, key)
        for j, figure in enumerate(figures or []):
            if save:
                figure.savefig(os.path.join(self.plots_dir, f"{j}_iter_{i}.png"))
            figure and plt.close(figure)

    def run(
        self,
        key: jax.Array,
        n_iterations: int,
        batch_size: int,
        eval_batch_size: Optional[int] = None,
        n_eval: Optional[int] = None,
        n_plot: Optional[int] = None,
        n_checkpoints: Optional[int] = None,
        save: bool = True,
        tlimit: Optional[float] = None,
        state: Optional[TrainState] = None,
        start_iter: int = 0,
        log_every: int = 1,
    ) -> TrainState:
        """Training loop with linspace-scheduled eval/plot/checkpoint
        (fab/train.py:63-160) and tlimit graceful stop."""
        if save:
            pathlib.Path(self.plots_dir).mkdir(parents=True, exist_ok=True)
            pathlib.Path(self.checkpoints_dir).mkdir(parents=True, exist_ok=True)
        checkpoint_iter = _schedule(n_iterations, n_checkpoints)
        eval_iter = _schedule(n_iterations, n_eval)
        plot_iter = _schedule(n_iterations, n_plot)
        if n_eval:
            assert eval_batch_size is not None

        if state is None:
            key, key_init = jax.random.split(key)
            state = self.init_state(key_init)
        # Dispatch in chunks of up to ``log_every`` iterations: one jitted scan per
        # chunk (make_scanned_train_step), stopping at every scheduled
        # eval/plot/checkpoint iteration. Amortises dispatch latency for small
        # batches without changing the schedule semantics.
        steps = {1: self.make_train_step(batch_size)}

        def run_chunk(state, key, k: int):
            if k not in steps:
                steps[k] = self.make_scanned_train_step(batch_size, k)
            return steps[k](state, key)

        compiled_ks: set = set()

        events = sorted(
            {n_iterations} | checkpoint_iter | eval_iter | plot_iter
        )
        start_time = time()
        max_it_time = 0.0

        i = start_iter
        while i < n_iterations:
            it_start = time()
            next_event = min(e for e in events if e > i)
            k = max(min(log_every, next_event - i), 1)
            key, key_step = jax.random.split(key)
            state, info = run_chunk(state, key_step, k)
            i += k
            t_info = info.pop("transition", None)
            host_info = dict(jax.device_get(info))
            if t_info is not None and self.model.ais is not None:
                host_info.update(
                    jax.device_get(
                        format_transition_info(
                            t_info,
                            self.model.ais.n_intermediate_distributions,
                        )
                    )
                )
            host_info["step"] = i
            self.logger.write(host_info)
            # Per-iteration time estimate for the tlimit projection, snapshotted
            # HERE (after the device_get sync, before eval/plot/checkpoint) so it
            # measures training-step time only — eval/plot XLA compiles riding on
            # a later chunk must not inflate it. Each chunk length's first run
            # (its own compile) is excluded.
            if k in compiled_ks:
                max_it_time = max(max_it_time, (time() - it_start) / k)
            compiled_ks.add(k)
            # Rate-limited stdout progress (the reference's tqdm postfix,
            # fab/train.py:93,122-125): at most one line per minute.
            now = time()
            if now - getattr(self, "_last_progress", 0.0) > 60.0:
                self._last_progress = now
                parts = [f"iter {i}/{n_iterations}"]
                for k_ in ("loss", "ess_ais", "ess_base", "n_valid"):
                    if k_ in host_info:
                        parts.append(f"{k_}={float(host_info[k_]):.4g}")
                print("  ".join(parts), flush=True)
            if i in eval_iter:
                key, key_eval = jax.random.split(key)
                self.perform_eval(state, key_eval, i, eval_batch_size, batch_size)
            if i in plot_iter:
                key, key_plot = jax.random.split(key)
                self._plots(state, key_plot, i, save)
            if i in checkpoint_iter and save:
                self.save_checkpoint(state, i)
            # tlimit projection: stop early enough that the next chunk (at the
            # measured per-iteration rate) would not overshoot. While no clean
            # per-iteration estimate exists yet (max_it_time == 0.0, e.g. no chunk
            # length has repeated), fall back to plain wall-clock checking so the
            # time box is always enforced.
            if tlimit is not None:
                hours = (time() - start_time) / 3600
                if hours + max_it_time * k / 3600 > tlimit:
                    if save and i not in checkpoint_iter:
                        self.save_checkpoint(state, i)
                    # Scheduled evals past this point will never run; record one
                    # at the stop iteration so time-boxed runs still end with
                    # eval metrics in the log (preemption-safe, fab/train.py:142).
                    if n_eval and i not in eval_iter:
                        key, key_eval = jax.random.split(key)
                        self.perform_eval(
                            state, key_eval, i, eval_batch_size, batch_size
                        )
                    self.logger.close()
                    print(f"Ending training at iteration {i}: tlimit reached.")
                    return state
        self.logger.close()
        return state


class BufferTrainState(NamedTuple):
    params: Any
    opt_state: Any
    buffer_state: Any  # PrioritisedBufferState | UniformBufferState
    step: Array


class BufferTrainer(Trainer):
    """FAB + uniform/recency replay buffer (fab/train_with_buffer.py:18-152).

    NOTE: the reference hard-disables this trainer as experimental
    (train_with_buffer.py:31); this is a working implementation of the same loop: one
    gradient step on the fresh AIS batch (with optional top-k-fraction log-weight
    clipping, :77-81), then n replay gradient steps on buffer samples, then add the
    AIS batch to the buffer.
    """

    def __init__(
        self,
        model: FABModel,
        optimizer: optax.GradientTransformation,
        buffer,  # fab_tpu.buffer.ReplayBuffer
        n_batches_buffer_sampling: int = 2,
        clip_ais_weights_frac: Optional[float] = None,
        logger: Optional[Logger] = None,
        plotter: Optional[Plotter] = None,
        save_path: str = "",
        dtype=jnp.float32,
    ):
        super().__init__(model, optimizer, logger, plotter, save_path, dtype=dtype)
        self.buffer = buffer
        self.n_batches_buffer_sampling = n_batches_buffer_sampling
        self.clip_ais_weights_frac = clip_ais_weights_frac

    def init_state(self, key: jax.Array, batch_size: int = 128) -> BufferTrainState:
        from fab_tpu.parallel.mesh import replicate, shard_flow_params

        key, key_init = jax.random.split(key)
        params = self.model.init(key_init, self.dtype)
        params = dict(
            replicate(params), flow=shard_flow_params(self.model.flow, params["flow"])
        )
        buffer_state = self.buffer.init(self.dtype)

        @jax.jit
        def fill_step(params, buffer_state, key):
            result = self.model.ais.sample_and_log_weights(
                params["flow"], params["transition"], key, batch_size,
                p_target=False, tune=True,
            )
            new_params = dict(params, transition=result.transition_state)
            buffer_state = self.buffer.add(
                buffer_state, result.point.x, result.log_w, result.mask
            )
            return new_params, buffer_state

        while int(buffer_state.n_added) < self.buffer.min_sample_length:
            key, key_fill = jax.random.split(key)
            params, buffer_state = fill_step(params, buffer_state, key_fill)
        return BufferTrainState(
            params=params,
            opt_state=self.optimizer.init(params["flow"]),
            buffer_state=buffer_state,
            step=jnp.zeros((), jnp.int32),
        )

    def _train_step_fn(self, batch_size: int):
        model, optimizer, buffer = self.model, self.optimizer, self.buffer
        alpha = model.alpha
        n_batches = self.n_batches_buffer_sampling
        clip_frac = self.clip_ais_weights_frac
        flow = model.flow

        def inner_update(flow_params, opt_state, x, log_w, mask, key=None):
            """One fab_alpha_div gradient step on given points/weights
            (fab/core.py:112-118 via train_with_buffer.py:84-93). Rows with
            non-finite log q are probed out and zero-filled first (no NaN
            cotangents, no skipped steps). ``key`` feeds stochastic-flow (SNF)
            log_prob noise; deterministic flows ignore it."""
            log_q_probe = jax.lax.stop_gradient(
                flow_log_prob(flow, flow_params, x, key)
            )
            mask = mask & jnp.isfinite(log_q_probe)
            x = jnp.where(mask[:, None], x, 0.0)

            def loss_fn(fp):
                log_q_x = flow_log_prob(flow, fp, x, key)
                return losses_lib.fab_alpha_div(log_q_x, log_w, alpha, mask)

            loss, grads = jax.value_and_grad(loss_fn)(flow_params)
            flow_params, opt_state, grad_norm, ok = guarded_update(
                optimizer, grads, opt_state, flow_params, loss
            )
            return flow_params, opt_state, loss, grad_norm

        def train_step(state: BufferTrainState, key: jax.Array):
            key_ais, key_sample = jax.random.split(key)
            result = model.ais.sample_and_log_weights(
                state.params["flow"], state.params["transition"], key_ais,
                batch_size, p_target=False, tune=True,
            )
            log_w_ais = result.log_w
            if clip_frac is not None:
                # Clamp the top clip_frac fraction of log-weights to the k-th
                # largest (train_with_buffer.py:77-81).
                k = max(2, int(clip_frac * batch_size))
                kth = jnp.min(jax.lax.top_k(log_w_ais, k)[0])
                log_w_ais = jnp.minimum(log_w_ais, kth)
            flow_params, opt_state, loss, grad_norm = inner_update(
                state.params["flow"], state.opt_state, result.point.x, log_w_ais,
                result.mask, jax.random.fold_in(key, 0x11A7),
            )

            def replay_step(carry, key_b):
                flow_params, opt_state = carry
                x, log_w = buffer.sample(state.buffer_state, key_b, batch_size)
                x = constrain_batch(x)
                mask = jnp.isfinite(log_w)
                flow_params, opt_state, r_loss, _ = inner_update(
                    flow_params, opt_state, x, log_w, mask,
                    jax.random.fold_in(key_b, 0x11A7),
                )
                return (flow_params, opt_state), r_loss

            (flow_params, opt_state), replay_losses = jax.lax.scan(
                replay_step,
                (flow_params, opt_state),
                jax.random.split(key_sample, n_batches),
            )
            buffer_state = buffer.add(
                state.buffer_state, result.point.x, log_w_ais, result.mask
            )
            new_params = dict(
                state.params, flow=flow_params, transition=result.transition_state
            )
            info = dict(
                result.info,
                loss=loss,
                grad_norm=grad_norm,
                replay_loss=replay_losses[-1],
            )
            return (
                BufferTrainState(new_params, opt_state, buffer_state, state.step + 1),
                info,
            )

        return train_step

    def save_checkpoint(self, state: BufferTrainState, i: int) -> None:
        path = os.path.join(self.checkpoints_dir, f"iter_{i}", "state.pkl")
        save_checkpoint(path, state._asdict())

    def load_state(self, path: str):
        from fab_tpu.buffer import UniformBufferState

        raw = load_checkpoint(path)
        raw["buffer_state"] = UniformBufferState(*raw["buffer_state"])
        return BufferTrainState(**raw), int(raw["step"])


class PrioritisedBufferTrainer(Trainer):
    """FAB + prioritised replay buffer (fab/train_with_prioritised_buffer.py:20-255).

    Per iteration (all inside ONE compiled program):
      1. AIS pass targeting g = p^alpha q^(1-alpha); add (x, log_w, log_q) to buffer.
      2. Gumbel-top-k sample n_batches_buffer_sampling x batch rows.
      3. For each replay batch (lax.scan): recompute log q, importance-weight
         adjustment w = clip(exp((1-alpha)(log q_new - log q_old)), clip), guarded
         gradient step on -mean(w log q), then adjust buffer priorities on the fly.
    """

    def __init__(
        self,
        model: FABModel,
        optimizer: optax.GradientTransformation,
        buffer: PrioritisedReplayBuffer,
        n_batches_buffer_sampling: int = 2,
        w_adjust_max_clip: Optional[float] = 10.0,
        w_adjust_in_buffer_after_update: bool = False,
        logger: Optional[Logger] = None,
        plotter: Optional[Plotter] = None,
        save_path: str = "",
        dtype=jnp.float32,
    ):
        super().__init__(model, optimizer, logger, plotter, save_path, dtype=dtype)
        self.buffer = buffer
        self.n_batches_buffer_sampling = n_batches_buffer_sampling
        self.w_adjust_max_clip = w_adjust_max_clip
        self.w_adjust_in_buffer_after_update = w_adjust_in_buffer_after_update

    # -------------------------------------------------------------- buffer init

    def init_state(
        self, key: jax.Array, batch_size: int = 128
    ) -> BufferTrainState:
        """Init flow/optimiser and fill the buffer to min length with AIS samples
        (prioritised_replay_buffer.py:62-66, setup_run.py:119-127)."""
        from fab_tpu.parallel.mesh import replicate, shard_flow_params

        key, key_init = jax.random.split(key)
        params = self.model.init(key_init, self.dtype)
        params = dict(
            replicate(params), flow=shard_flow_params(self.model.flow, params["flow"])
        )
        buffer_state = self.buffer.init(self.dtype)

        @jax.jit
        def fill_step(params, buffer_state, key):
            result = self.model.ais.sample_and_log_weights(
                params["flow"],
                params["transition"],
                key,
                batch_size,
                p_target=False,
                tune=True,
            )
            new_params = dict(params, transition=result.transition_state)
            buffer_state = self.buffer.add(
                buffer_state,
                result.point.x,
                result.log_w,
                result.point.log_q,
                result.mask,
            )
            return new_params, buffer_state

        while int(buffer_state.n_added) < self.buffer.min_sample_length:
            key, key_fill = jax.random.split(key)
            params, buffer_state = fill_step(params, buffer_state, key_fill)

        return BufferTrainState(
            params=params,
            opt_state=self.optimizer.init(params["flow"]),
            buffer_state=buffer_state,
            step=jnp.zeros((), jnp.int32),
        )

    # -------------------------------------------------------------- train step

    def _train_step_fn(self, batch_size: int):
        model, optimizer, buffer = self.model, self.optimizer, self.buffer
        alpha = model.alpha
        n_batches = self.n_batches_buffer_sampling
        w_clip = self.w_adjust_max_clip
        adjust_after = self.w_adjust_in_buffer_after_update
        flow = model.flow

        def train_step(state: BufferTrainState, key: jax.Array):
            key_ais, key_sample = jax.random.split(key)
            # 1. AIS pass + buffer add (train_with_prioritised_buffer.py:142-149).
            result = model.ais.sample_and_log_weights(
                state.params["flow"],
                state.params["transition"],
                key_ais,
                batch_size,
                p_target=False,
                tune=True,
            )
            # Optional train-time sample filter (ALDP chirality: mask D-form rows
            # to -inf priority before buffer-add, matching the reference's
            # row-dropping at experiments/aldp/train.py:318-326).
            add_mask = model.filter_batch(result.point.x, result.mask)
            filter_info = {}
            if model.sample_filter is not None:
                n_valid = jnp.maximum(jnp.sum(result.mask), 1)
                filter_info["frac_filter_pass"] = (
                    jnp.sum(add_mask & result.mask) / n_valid
                )
            buffer_state = buffer.add(
                state.buffer_state,
                result.point.x,
                result.log_w,
                result.point.log_q,
                add_mask,
            )
            # 2. Sample replay batches ([n_batches, batch] each).
            xs, log_ws, log_q_olds, idxs = buffer.sample_n_batches(
                buffer_state, key_sample, batch_size, n_batches
            )

            # Per-replay-batch keys for stochastic-flow (SNF) log_prob noise;
            # deterministic flows ignore them.
            replay_keys = jax.random.split(
                jax.random.fold_in(key, 0x11A7), n_batches
            )

            # 3. Replay gradient steps (train_with_prioritised_buffer.py:158-186).
            def replay_step(carry, batch_data):
                flow_params, opt_state, buffer_state = carry
                x, log_w_b, log_q_old, idx, key_lq = batch_data
                x = constrain_batch(x)
                row_ok = jnp.isfinite(log_w_b)  # killed/unwritten rows
                # Probe pass: rows whose log q is non-finite (extreme AIS points)
                # are excluded from the loss and killed in the buffer, instead of
                # the reference's skip-the-whole-step behaviour
                # (train_with_prioritised_buffer.py:172-181). The probe also lets
                # us zero-fill bad rows BEFORE the differentiated evaluation so no
                # NaN cotangents can leak.
                log_q_probe = jax.lax.stop_gradient(
                    flow_log_prob(flow, flow_params, x, key_lq)
                )
                row_ok = row_ok & jnp.isfinite(log_q_probe)
                x = jnp.where(row_ok[:, None], x, 0.0)

                def loss_fn(fp):
                    log_q_x = flow_log_prob(flow, fp, x, key_lq)
                    loss, log_w_adjust, w_pre = losses_lib.buffer_replay_loss(
                        log_q_x, log_q_old, alpha, w_clip, row_ok
                    )
                    return loss, (log_w_adjust, log_q_x, w_pre)

                (loss, (log_w_adjust, log_q_x, w_pre)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(flow_params)
                flow_params, opt_state, grad_norm, ok = guarded_update(
                    optimizer, grads, opt_state, flow_params, loss
                )
                if not adjust_after:
                    # On-the-fly priority adjustment (:183-186). Invalid replay rows
                    # keep their -inf priority (adjustment masked to -inf via NaN
                    # handling in buffer.adjust on non-finite inputs).
                    buffer_state = buffer.adjust(
                        buffer_state,
                        jnp.where(row_ok, log_w_adjust, jnp.nan),
                        log_q_x,
                        idx,
                    )
                step_info = {
                    "loss": loss,
                    "grad_norm": grad_norm,
                    "update_applied": ok,
                    "w_adjust_mean": jnp.mean(jnp.where(row_ok, w_pre, 0.0)),
                    "w_adjust_min": jnp.min(jnp.where(row_ok, w_pre, jnp.inf)),
                    "w_adjust_max": jnp.max(jnp.where(row_ok, w_pre, -jnp.inf)),
                    "log_q_x_mean": jnp.mean(jnp.where(row_ok, log_q_x, 0.0)),
                }
                return (flow_params, opt_state, buffer_state), step_info

            (flow_params, opt_state, buffer_state), replay_infos = jax.lax.scan(
                replay_step,
                (state.params["flow"], state.opt_state, buffer_state),
                (xs, log_ws, log_q_olds, idxs, replay_keys),
            )

            if adjust_after:
                # Post-hoc adjustment pass over the same mini-dataset
                # (train_with_prioritised_buffer.py:200-214).
                def adjust_step(buffer_state, batch_data):
                    x, log_w_b, log_q_old, idx, key_lq = batch_data
                    row_ok = jnp.isfinite(log_w_b)
                    log_q_new = flow_log_prob(flow, flow_params, x, key_lq)
                    log_w_adjust = (1 - alpha) * (log_q_new - log_q_old)
                    buffer_state = buffer.adjust(
                        buffer_state,
                        jnp.where(row_ok, log_w_adjust, jnp.nan),
                        log_q_new,
                        idx,
                    )
                    return buffer_state, None

                buffer_state, _ = jax.lax.scan(
                    adjust_step, buffer_state,
                    (xs, log_ws, log_q_olds, idxs, replay_keys),
                )

            new_params = dict(
                state.params,
                flow=flow_params,
                transition=result.transition_state,
            )
            sampled_log_w = jnp.where(jnp.isfinite(log_ws), log_ws, 0.0)
            info = dict(
                result.info,
                **filter_info,
                # Reference logs the *last* replay batch's values
                # (train_with_prioritised_buffer.py:189-198).
                **{k: v[-1] for k, v in replay_infos.items()},
                sampled_log_w_mean=jnp.mean(sampled_log_w),
                sampled_log_w_std=jnp.std(sampled_log_w),
            )
            return (
                BufferTrainState(
                    new_params, opt_state, buffer_state, state.step + 1
                ),
                info,
            )

        return train_step

    def save_checkpoint(self, state: BufferTrainState, i: int) -> None:
        path = os.path.join(self.checkpoints_dir, f"iter_{i}", "state.pkl")
        save_checkpoint(path, state._asdict())

    def load_state(self, path: str) -> Tuple[BufferTrainState, int]:
        raw = load_checkpoint(path)
        raw["buffer_state"] = PrioritisedBufferState(*raw["buffer_state"])
        state = BufferTrainState(**raw)
        return state, int(raw["step"])

    def perform_eval(
        self, state, key: jax.Array, i: int, eval_batch_size: int, batch_size: int
    ) -> None:
        """Dual-target eval: once with AIS target p, once with the min-var target
        (train_with_prioritised_buffer.py:79-102)."""
        key_p, key_mv = jax.random.split(key)
        info_p = self.model.get_eval_info(
            state.params, key_p, eval_batch_size, batch_size, p_target=True
        )
        info_mv = self.model.get_eval_info(
            state.params,
            key_mv,
            eval_batch_size,
            batch_size,
            p_target=False,
            ais_only=True,
        )
        eval_info = {k + "_p_target": v for k, v in info_p.items()}
        eval_info.update({k + "_min_var_target": v for k, v in info_mv.items()})
        eval_info["step"] = i
        self.logger.write(eval_info)
