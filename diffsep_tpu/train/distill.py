"""Progressive distillation for the mixing-SDE family — beyond-reference
low-NFE capability (the reference has no distillation; its fast-sampling
story ends at the PC sampler's N knob, see pl_model.py:687-759).

Method: Salimans & Ho, "Progressive Distillation for Fast Sampling of
Diffusion Models" (ICLR 2022), re-derived for MixSDE/PriorMixSDE's
closed-form Gaussian transitions. The student learns a deterministic
N-step DDIM sampler from a teacher running the same transition at finer
resolution:

* the student parameterizes each step by the data prediction
  ``x0_hat = M(t)^{-1} (x_t + Sigma(t) score)`` and transports between
  exact marginals, ``x_{t'} = M(t') x0 + L(t') L(t)^{-1} (x_t - M(t) x0)``
  (identical to the "ddim" predictor, sampling/predictors.py:110-139);
* the teacher integrates the same interval with ``substeps`` micro-steps;
* because the one-step transport is AFFINE in x0 and every operator is
  simultaneously diagonal in the {A, Pn} projector basis (A = 11^T/n,
  Pn = I - A — see sde/mixsde.py:39-43), the x0 that makes ONE student
  step land exactly on the teacher's endpoint has a closed form:

      x_next - R x_t = (M(t') - R M(t)) x0,   R = L(t') L(t)^{-1}
      M(t') - R M(t) = (1 - r1) A + (e^{-lam t'} - r2 e^{-lam t}) Pn

  with r_k = sqrt(ev_k(t') / ev_k(t)); both eigen-coefficients are
  strictly positive for t' < t (ev_k is monotone increasing), so the
  inverse is A / (1 - r1) + Pn / (e^{-lam t'} - r2 e^{-lam t}).
  PriorMixSDE's per-sample power envelope multiplies both sigmas by a
  time-independent factor that cancels in every ratio, so the same
  formula covers it.

The distillation grid matches `sampling/pc.py:pc_sample` exactly
(schedule=None): ``ts = linspace(T, eps, N)``; steps i < N-1 transport
ts[i] -> ts[i+1]; the final step is the identity transport whose denoised
output IS the data prediction — so its target is the teacher's own x0
prediction (which progressive halving has itself trained to be the
transport-consistent x0). A student distilled at N therefore serves with
the stock sampler: ``model.separate(..., predictor_name="ddim",
corrector_name="none", N=N)`` — no new inference code.

TPU notes: one jitted program per distillation step (teacher substeps are
a static Python loop — they unroll into the single traced graph), loss in
x0-space with optional per-eigenchannel truncated-SNR weighting, and the
same TrainState/EMA/clipper machinery as score training so checkpoints
interoperate.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..sde.base import SDE
from ..sde.mixsde import mix_mats
from . import ema as ema_lib
from .clippers import grad_norm
from .losses import normalize_batch, power_order_sources, shuffle_sources
from .trainer import OptimConfig, TrainState, init_train_state

Array = jax.Array


# --------------------------------------------------------------------------
# functional DDIM algebra — the ACTUAL serving predictor's functions
# (sampling/predictors.py), imported rather than re-derived so the student
# regresses onto exactly what DDIMPredictor.update will run at serving time
# --------------------------------------------------------------------------
from ..sampling.predictors import data_prediction, ddim_transition  # noqa: E402,F401 (re-exported)


def ddim_transport(sde: SDE, score_fn: Callable, x: Array, t: Array,
                   t_next: Array, cond: Array, substeps: int = 2):
    """Integrate t -> t_next with `substeps` DDIM micro-steps on a linear
    subgrid. Returns (x_end, x0_hat_last); `substeps` is static, so the
    micro-steps unroll inside the surrounding jit."""
    x0_hat = None
    for j in range(substeps):
        a0 = j / substeps
        a1 = (j + 1) / substeps
        tj = t * (1.0 - a0) + t_next * a0
        tj1 = t * (1.0 - a1) + t_next * a1
        x0_hat = data_prediction(sde, score_fn, x, tj, cond)
        x = ddim_transition(sde, x, tj, tj1, x0_hat)
    return x, x0_hat


def _transport_eigcoeffs(sde: SDE, t: Array, t_next: Array):
    """Eigen-coefficients of M(t') - R M(t) along (A, Pn)."""
    ev1, ev2 = sde._cov_eigval(t)
    ev1n, ev2n = sde._cov_eigval(t_next)
    r1 = jnp.sqrt(ev1n / ev1)
    r2 = jnp.sqrt(ev2n / ev2)
    cA = 1.0 - r1
    cP = jnp.exp(-sde.d_lambda * t_next) - r2 * jnp.exp(-sde.d_lambda * t)
    return cA, cP


def invert_ddim_x0(sde: SDE, x_t: Array, t: Array, t_next: Array,
                   x_next: Array) -> Array:
    """The x0 for which one DDIM step from (x_t, t) lands on (x_next, t').

    Closed-form: see module docstring. Denominators are clamped away from
    zero so the t' == t (identity-transport) case stays finite — callers
    select that case away with `where`.
    """
    resid = x_next - sde.apply_std_ratio(t_next, t, x_t)
    cA, cP = _transport_eigcoeffs(sde, t, t_next)
    tiny = 1e-12
    cA = jnp.where(jnp.abs(cA) > tiny, cA, 1.0)
    cP = jnp.where(jnp.abs(cP) > tiny, cP, 1.0)
    A, Pn = mix_mats(x_t.shape[1], x_t.dtype)
    inv = (1.0 / cA)[:, None, None] * A + (1.0 / cP)[:, None, None] * Pn
    return inv @ resid


def snr_channel_weights(sde: SDE, t: Array, cond: Optional[Array] = None):
    """Truncated per-eigenchannel SNR weights max(alpha_k^2 / sigma_k^2, 1)
    (Salimans & Ho 2022, eq. 10's "truncated SNR" loss, per {A, Pn}
    channel: alpha_A = 1, alpha_Pn = e^{-lam t}).

    PriorMixSDE's marginal std carries the per-sample (and per-position)
    mixture-power envelope (mixsde.py:_std) — the envelope does NOT cancel
    here (the weight is a plain SNR, not a transport ratio), so when `cond`
    is given and the SDE defines the envelope, sigma_k^2 is env^2 * ev_k.
    Returns (b, 1, 1)- or (b, 1, samples)-shaped weights, broadcastable
    against the (b, n, samples) residual."""
    ev1, ev2 = sde._cov_eigval(t)
    snr1 = (1.0 / ev1)[:, None, None]
    snr2 = (jnp.exp(-2.0 * sde.d_lambda * t) / ev2)[:, None, None]
    if cond is not None and hasattr(sde, "_std_sigma_mix"):
        env = sde._std_sigma_mix(cond)  # (b, 1, samples)
        env2 = (env * env).astype(snr1.dtype)
        snr1 = snr1 / env2
        snr2 = snr2 / env2
    return jnp.maximum(snr1, 1.0), jnp.maximum(snr2, 1.0)


def init_student_state(teacher_params, tx, clipper) -> TrainState:
    """TrainState whose params are a deep COPY of the teacher's.

    The student always starts from the teacher's weights, but the buffers
    must be distinct: the distill step donates the state while the teacher
    params ride along as a second argument, and XLA rejects a donated
    buffer that is also a live input (`f(donate(a), a)`)."""
    student = jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True), teacher_params
    )
    return init_train_state(student, tx, clipper)


# --------------------------------------------------------------------------
# the distillation step
# --------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class DistillConfig:
    """Static distillation knobs."""

    n_student: int = 8  # student step count (the serving N)
    t_eps: float = 0.03  # grid endpoint, = model t_eps
    # time grid, matching pc_sample's `schedule` semantics exactly
    # (None = linspace(T, eps, N); "linear"/"log"/"revlog" = N+1-point
    # named grids, sampling/pc.py:make_timesteps) — distill and serve with
    # the SAME value
    schedule: Optional[str] = None
    teacher_substeps: int = 2  # teacher micro-steps per student step
    weighting: str = "truncated_snr"  # "truncated_snr" | "none"
    source_order: str = "power"  # match the teacher's training convention
    # probability of drawing x_T from the SAMPLING prior (mean = mix/n)
    # instead of the forward marginal when the sampled step is i == 0;
    # covers the serving-time prior mismatch e^{-lam T} Pn x0 the same way
    # the reference's init_hack does for score training (pl_model.py:179+)
    prior_mix_at_T: float = 0.5
    # probability of generating x_t ON-POLICY: run the STUDENT's own DDIM
    # sampler (stop-gradient) from a prior draw down to ts[i] and distill
    # from there — the serving-time input distribution, which at very low
    # N drifts from the forward marginals as teacher/student errors
    # compound (TRACT / consistency-model style). Costs N-1 extra student
    # evals per step; 0.0 (default) compiles them away entirely.
    on_policy_frac: float = 0.0


def distill_loss(
    key: jax.Array,
    sde: SDE,
    student_score_fn: Callable,
    teacher_score_fn: Callable,
    mix: Array,
    target: Array,
    cfg: DistillConfig,
) -> Array:
    """One-term x0-space regression loss, scalar. Inputs are already in the
    normalized domain (the step wrapper applies normalize_batch)."""
    from ..sampling.pc import make_timesteps

    n = cfg.n_student
    ts, _ = make_timesteps(sde.T, cfg.t_eps, n, cfg.schedule)

    if cfg.source_order == "power":
        target = power_order_sources(target)
    elif cfg.source_order == "random":
        key, ko = jax.random.split(key)
        target = shuffle_sources(ko, target)

    b = target.shape[0]
    ki, kz, kp = jax.random.split(key, 3)
    i = jax.random.randint(ki, (b,), 0, n)
    is_last = i == n - 1
    t = ts[i]
    t_next = jnp.where(is_last, t, ts[jnp.minimum(i + 1, n - 1)])

    # x_t ~ q(x_t | x0) — and, at the top of the grid, optionally from the
    # sampler's actual prior so the student sees serving-time inputs
    mean, L = sde.marginal_prob(target, t, mix)
    z = jax.random.normal(kz, target.shape, target.dtype)
    x_t = mean + sde.mult_std(L, z)
    if cfg.prior_mix_at_T > 0.0:
        kp, kp2 = jax.random.split(kp)
        use_prior = (i == 0) & (
            jax.random.uniform(kp2, (b,)) < cfg.prior_mix_at_T
        )
        prior_mean = jnp.broadcast_to(mix / target.shape[1], target.shape)
        x_prior = prior_mean + sde.mult_std(L, z)
        x_t = jnp.where(use_prior[:, None, None], x_prior, x_t)

    if cfg.on_policy_frac > 0.0:
        # serving-time input: the student's OWN trajectory state at ts[i]
        # (stop-gradient — it supplies inputs, not gradients). One scan
        # computes every grid state; each row gathers its own i.
        ko, kb = jax.random.split(jax.random.fold_in(kp, 1))
        sg_student = lambda x, tt, m: jax.lax.stop_gradient(
            student_score_fn(x, tt, m)
        )
        x_start = sde.prior_sampling(ko, mix)

        def roll(x, j):
            tj = jnp.full((b,), ts[j], x.dtype)
            tj1 = jnp.full((b,), ts[jnp.minimum(j + 1, n - 1)], x.dtype)
            x0h = data_prediction(sde, sg_student, x, tj, mix)
            return ddim_transition(sde, x, tj, tj1, x0h), x

        _, traj = jax.lax.scan(roll, x_start, jnp.arange(n))  # pre-step states
        x_onpol = jnp.take_along_axis(
            traj, i[None, :, None, None], axis=0
        )[0]
        use_onpol = jax.random.uniform(kb, (b,)) < cfg.on_policy_frac
        x_t = jnp.where(use_onpol[:, None, None],
                        jax.lax.stop_gradient(x_onpol), x_t)

    # teacher: fine transport over the student's interval (identity when
    # is_last — then its final micro-step x0_hat is the target instead)
    x_end, teacher_x0 = ddim_transport(
        sde, teacher_score_fn, x_t, t, t_next, mix, cfg.teacher_substeps
    )
    x0_inv = invert_ddim_x0(sde, x_t, t, t_next, x_end)
    x0_target = jax.lax.stop_gradient(
        jnp.where(is_last[:, None, None], teacher_x0, x0_inv)
    )

    x0_pred = data_prediction(sde, student_score_fn, x_t, t, mix)
    r = x0_pred - x0_target
    if cfg.weighting == "truncated_snr":
        A, Pn = mix_mats(r.shape[1], r.dtype)
        w1, w2 = snr_channel_weights(sde, t, mix)
        per = (w1 * (A @ r) ** 2).mean(axis=(-2, -1)) + (
            w2 * (Pn @ r) ** 2
        ).mean(axis=(-2, -1))
    elif cfg.weighting == "none":
        per = (r**2).mean(axis=(-2, -1))
    else:
        raise ValueError(f"unknown weighting '{cfg.weighting}'")
    return per.mean()


def make_distill_step(
    score_apply: Callable,  # score_apply(params, x_t, t, mix) -> score
    sde: SDE,
    tx: optax.GradientTransformation,
    clipper,
    optim_cfg: OptimConfig,
    base_key: jax.Array,
    distill_cfg: DistillConfig,
):
    """(state, teacher_params, mix, target) -> (state, metrics); jittable.

    Same update plumbing as trainer.make_train_step (clipper -> optimizer
    -> EMA) so distilled checkpoints ride the existing save/load path; the
    teacher's params are an ordinary traced input (pass EMA params)."""

    def loss_fn(params, teacher_params, key, mix, target):
        (mix, target), _, _ = normalize_batch(mix, target)
        student = lambda x, t, m: score_apply(params, x, t, m)
        teacher = lambda x, t, m: score_apply(teacher_params, x, t, m)
        return distill_loss(
            key, sde, student, teacher, mix, target, distill_cfg
        )

    every_k = optim_cfg.accumulate_grad_batches

    def distill_step(state: TrainState, teacher_params, mix, target):
        key = jax.random.fold_in(base_key, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, teacher_params, key, mix, target
        )
        if clipper is not None:
            grads, clip_state, (gnorm, _) = clipper(grads, state.clip_state)
        else:
            clip_state = state.clip_state
            gnorm = grad_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # EMA only on applied optimizer steps — under optax.MultiSteps
        # accumulation an unconditional update would decay the shadow
        # toward unchanged params every mini-step, halving the averaging
        # horizon (same gating as trainer.make_train_step)
        if every_k > 1:
            applied = opt_state.mini_step == 0
        else:
            applied = jnp.asarray(True)
        new_ema = ema_lib.update(state.ema, params, optim_cfg.ema_decay)
        ema_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(applied, new, old), new_ema, state.ema
        )
        metrics = {"distill/loss": loss, "grad/norm": gnorm}
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

    return distill_step


def progressive_distill(
    model,  # DiffSepModel façade
    teacher_params,
    batch_fn: Callable[[int], tuple],  # step index -> (mix, target) arrays
    stages: tuple = (16, 8, 4, 2),
    steps_per_stage: int = 1000,
    base_key: Optional[jax.Array] = None,
    teacher_substeps: int = 2,
    log_every: int = 0,
    stage_cache_dir: Optional[str] = None,
    **cfg_kwargs: Any,
):
    """Run the halving schedule: each stage distills an N-step student from
    the previous stage's EMA params (stage 0's teacher = `teacher_params`).
    Returns {N: ema_params} for every stage.

    `batch_fn(step)` supplies (mix, target) — a callable rather than an
    iterator so callers can regenerate/synthesize per step.

    `stage_cache_dir` makes the schedule RESUMABLE: each finished stage's
    EMA params are saved as `stage{i}_N{n}.msgpack` there and a rerun loads
    them instead of re-training the stage.  The caller owns cache keying —
    pass a directory that encodes everything the stage depends on (teacher
    identity/seed/schedule/steps), because a stale file is loaded blindly.
    Motivation: on the axon remote-TPU tunnel, transient blips can wedge
    the client mid-run (observed repeatedly, round 5); per-stage caching
    bounds what a kill-and-relaunch loses to one stage.
    """
    base_key = base_key if base_key is not None else jax.random.PRNGKey(0)
    out = {}
    cache_dir = None
    if stage_cache_dir is not None:
        from pathlib import Path

        cache_dir = Path(stage_cache_dir)
        cache_dir.mkdir(parents=True, exist_ok=True)
    for si, n in enumerate(stages):
        cache = (
            cache_dir / f"stage{si}_N{int(n)}.msgpack"
            if cache_dir is not None
            else None
        )
        if cache is not None and cache.exists():
            from flax import serialization

            teacher_params = jax.device_put(serialization.from_bytes(
                jax.device_get(teacher_params), cache.read_bytes()
            ))
            out[int(n)] = teacher_params
            print(
                f"[distill N={n}] stage loaded from cache {cache}",
                flush=True,
            )
            continue
        cfg = DistillConfig(
            n_student=int(n),
            t_eps=model.t_eps,
            teacher_substeps=teacher_substeps,
            source_order=model.loss_cfg.train_source_order,
            **cfg_kwargs,
        )
        step_fn = jax.jit(
            make_distill_step(
                model.score_apply,
                model.sde,
                model.tx,
                model.clipper,
                model.optim_cfg,
                jax.random.fold_in(base_key, si),
                cfg,
            ),
            donate_argnums=(0,),
        )
        state = init_student_state(teacher_params, model.tx, model.clipper)
        for step in range(steps_per_stage):
            mix, target = batch_fn(step)
            state, metrics = step_fn(state, teacher_params, mix, target)
            if log_every and (step + 1) % log_every == 0:
                print(
                    f"[distill N={n}] step {step + 1}: "
                    f"loss {float(jax.device_get(metrics['distill/loss'])):.5f}",
                    flush=True,
                )
        teacher_params = state.ema.params
        out[int(n)] = teacher_params
        if cache is not None:
            from flax import serialization

            cache.write_bytes(
                serialization.to_bytes(jax.device_get(teacher_params))
            )
    return out
