"""pjit training core: train state, fused train step, validation step.

Capability parity with the orchestration half of pl_model.py (DiffSepModel
training_step/validation_step/configure_optimizers/optimizer_step/
on_after_backward/do_lr_warmup) redesigned as pure functions over an
explicit TrainState:

  * optimizer: optax.adam (+ optional weight decay), LR warmup as an optax
    schedule reproducing pl_model.py:680-685 (linear scale for the first
    `lr_warmup` optimizer steps)
  * gradient accumulation: optax.MultiSteps (reference: Lightning
    accumulate_grad_batches, config/trainer/default.yaml:2)
  * gradient clipping BEFORE the optimizer, fixed or AutoClip, with
    (grad_norm, clipped_norm, step_size) metrics (pl_model.py:616-639)
  * EMA updated only on applied optimizer steps (pl_model.py:611-614)
  * data parallelism: the caller shards the batch's leading axis over the
    mesh's `dp` axis; all means inside the loss become global means and XLA
    inserts the gradient all-reduce — the NCCL DDP equivalent (SURVEY §2.8)

The whole step — loss, backward, clip, optimizer, EMA — is ONE jitted
function; there is no Python between micro-batches.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..sde.base import SDE
from . import ema as ema_lib
from .clippers import AutoClipper, FixedClipper, grad_norm
from .losses import normalize_batch, training_loss

Array = jax.Array


class TrainState(struct.PyTreeNode):
    step: Array  # micro-batch counter
    params: Any
    opt_state: Any
    ema: ema_lib.EMAState
    clip_state: Any


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Static training-loss knobs (config/model/*.yaml model section)."""

    t_eps: float = 0.03
    t_rev_init: float = 0.03
    init_hack: int | bool = False
    init_hack_p: float = 0.1
    train_source_order: str = "random"
    mmnr_thresh_pit: float = -10.0
    time_sampling_strategy: str = "uniform"


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr: float = 1e-4
    weight_decay: float = 0.0
    lr_warmup: Optional[int] = None
    accumulate_grad_batches: int = 1
    ema_decay: float = 0.999
    grad_clipper: str = "fixed"  # "fixed" | "autoclip" | "none"
    clip_max_norm: float = 5.0
    autoclip_percentile: float = 10.0
    # optional decay schedule applied after warmup, mirroring the
    # reference's `model.scheduler` hydra slot (pl_model.py:592-597):
    # None | "exponential" (gamma) | "step" (step_size, gamma) | "cosine"
    # (t_max)
    scheduler: Optional[str] = None
    scheduler_gamma: float = 0.99
    scheduler_step_size: int = 1000
    scheduler_t_max: int = 100000


def make_lr_schedule(cfg: OptimConfig) -> Callable:
    """Warmup (pl_model.py:680-685) composed with an optional decay
    schedule (reference `model.scheduler`, pl_model.py:592-597)."""

    def decay(step):
        if cfg.scheduler == "exponential":
            return cfg.scheduler_gamma**step
        if cfg.scheduler == "step":
            return cfg.scheduler_gamma ** jnp.floor(
                step / cfg.scheduler_step_size
            )
        if cfg.scheduler == "cosine":
            frac = jnp.clip(step / cfg.scheduler_t_max, 0.0, 1.0)
            return 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
        return 1.0

    if not cfg.lr_warmup:
        return lambda step: cfg.lr * decay(step)
    return lambda step: (
        cfg.lr * jnp.minimum(1.0, (step + 1.0) / cfg.lr_warmup) * decay(step)
    )


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    sched = make_lr_schedule(cfg)
    if cfg.weight_decay:
        tx = optax.adamw(learning_rate=sched, weight_decay=cfg.weight_decay)
    else:
        tx = optax.adam(learning_rate=sched)
    if cfg.accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulate_grad_batches)
    return tx


def make_clipper(cfg: OptimConfig):
    if cfg.grad_clipper == "fixed":
        return FixedClipper(cfg.clip_max_norm)
    if cfg.grad_clipper == "autoclip":
        return AutoClipper(cfg.autoclip_percentile)
    if cfg.grad_clipper == "none":
        return None
    raise ValueError(cfg.grad_clipper)


def init_train_state(params, tx: optax.GradientTransformation, clipper) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema=ema_lib.init(params),
        clip_state=clipper.init() if clipper is not None else (),
    )


def make_train_step(
    score_apply: Callable,  # score_apply(params, x_t, t, mix) -> score
    sde: SDE,
    tx: optax.GradientTransformation,
    clipper,
    loss_cfg: LossConfig,
    optim_cfg: OptimConfig,
    base_key: jax.Array,
):
    """Build the jittable train step: (state, mix, target) -> (state, metrics).

    Batch normalization by mixture stats happens inside (pl_model.py:497).
    """
    sched = make_lr_schedule(optim_cfg)
    every_k = optim_cfg.accumulate_grad_batches

    def loss_fn(params, key, mix, target, sample_weight):
        (mix, target), _, _ = normalize_batch(mix, target)
        score_fn = lambda x, t, m: score_apply(params, x, t, m)
        return training_loss(
            key,
            sde,
            score_fn,
            mix,
            target,
            t_eps=loss_cfg.t_eps,
            init_hack=loss_cfg.init_hack,
            init_hack_p=loss_cfg.init_hack_p,
            t_rev_init=loss_cfg.t_rev_init,
            train_source_order=loss_cfg.train_source_order,
            mmnr_thresh_pit=loss_cfg.mmnr_thresh_pit,
            time_strategy=loss_cfg.time_sampling_strategy,
            sample_weight=sample_weight,
        )

    def train_step(
        state: TrainState, mix: Array, target: Array, sample_weight=None
    ):
        key = jax.random.fold_in(base_key, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, key, mix, target, sample_weight
        )

        if clipper is not None:
            grads, clip_state, (gnorm, thresh) = clipper(grads, state.clip_state)
            clipped = jnp.minimum(gnorm, thresh)
        else:
            clip_state = state.clip_state
            gnorm = grad_norm(grads)
            clipped = gnorm
            thresh = gnorm

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        # EMA only on applied optimizer steps (pl_model.py:611-614)
        if every_k > 1:
            applied = opt_state.mini_step == 0
        else:
            applied = jnp.asarray(True)
        new_ema = ema_lib.update(state.ema, params, optim_cfg.ema_decay)
        ema_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(applied, new, old), new_ema, state.ema
        )

        opt_step = state.step // every_k
        lr = sched(opt_step)
        metrics = {
            "train/score_loss": loss,
            "grad/norm": gnorm,
            "grad/clipped_norm": clipped,
            "grad/step_size": lr * clipped,
            "lr": lr,
        }
        return (
            state.replace(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                ema=ema_state,
                clip_state=clip_state,
            ),
            metrics,
        )

    return train_step


def make_val_score_loss(
    score_apply: Callable, sde: SDE, loss_cfg: LossConfig, base_key: jax.Array
):
    """Validation score loss with the same init-hack dispatch as training
    (pl_model.py:540-554)."""

    def val_loss(params, mix, target, step):
        key = jax.random.fold_in(base_key, step)
        (mix, target), _, _ = normalize_batch(mix, target)
        score_fn = lambda x, t, m: score_apply(params, x, t, m)
        return training_loss(
            key, sde, score_fn, mix, target,
            t_eps=loss_cfg.t_eps,
            init_hack=loss_cfg.init_hack,
            init_hack_p=loss_cfg.init_hack_p,
            t_rev_init=loss_cfg.t_rev_init,
            train_source_order=loss_cfg.train_source_order,
            mmnr_thresh_pit=loss_cfg.mmnr_thresh_pit,
            time_strategy=loss_cfg.time_sampling_strategy,
        )

    return val_loss


