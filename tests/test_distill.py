"""Progressive distillation (train/distill.py) — beyond-reference low-NFE
capability (the reference's fast-sampling story ends at the PC sampler's N
knob, pl_model.py:687-759).

Key invariants under test:
* the closed-form x0 inversion is the exact inverse of the DDIM transport
  (both mixing SDEs, incl. PriorMixSDE's envelope cancellation);
* with the EXACT score of a delta data distribution every piece —
  data_prediction, the teacher transport, the inverted target, and the
  whole distill loss — collapses onto the true x0 (the distillation
  fixed point);
* the student's serving grid is EXACTLY pc_sample's ddim grid: the
  unrolled transport reproduces model-free pc_sample output bit-for-bit
  in f32 tolerance, so a distilled student needs no new inference code;
* a real (tiny) model's distillation step runs jitted and reduces its
  own loss.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsep_tpu.sampling.pc import pc_sample
from diffsep_tpu.sde.mixsde import MixSDE, PriorMixSDE
from diffsep_tpu.train.distill import (
    DistillConfig,
    data_prediction,
    ddim_transition,
    ddim_transport,
    distill_loss,
    invert_ddim_x0,
    progressive_distill,
    snr_channel_weights,
)


def _rng():
    return np.random.default_rng(1234)


def _sdes():
    return [MixSDE(N=8), PriorMixSDE(N=8, avg_len=32)]


def _exact_delta_score(sde, x0):
    """score of q(x_t | x0) for a fixed x0: s = -Sigma^{-1}(x - M(t) x0)."""

    def score_fn(x, t, cond):
        mean, L = sde.marginal_prob(x0, t, cond)
        return -sde.mult_std_inv(L, sde.mult_std_inv(L, x - mean))

    return score_fn


@pytest.mark.parametrize("sde", _sdes(), ids=["mix", "priormix"])
def test_invert_ddim_x0_roundtrip(sde):
    """transition(x_t, t, t', x0) then invert(x_t, t, t', .) == x0 for
    arbitrary x0 — the affine transport is inverted exactly."""
    rng = _rng()
    b, n = 3, 256
    x_t = jnp.asarray(rng.standard_normal((b, 2, n)), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal((b, 2, n)), jnp.float32)
    for t_hi, t_lo in [(1.0, 0.5), (0.6, 0.03), (0.08, 0.03)]:
        t = jnp.full((b,), t_hi, jnp.float32)
        t_next = jnp.full((b,), t_lo, jnp.float32)
        x_next = ddim_transition(sde, x_t, t, t_next, x0)
        rec = invert_ddim_x0(sde, x_t, t, t_next, x_next)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x0),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("sde", _sdes(), ids=["mix", "priormix"])
def test_exact_score_recovers_x0(sde):
    """With the exact delta-data score, data_prediction == x0 at every t,
    and the teacher transport + inversion target == x0 (the distillation
    fixed point) for any substep count."""
    rng = _rng()
    b, n = 2, 512
    x0 = jnp.asarray(0.1 * rng.standard_normal((b, 2, n)), jnp.float32)
    mix = x0.sum(axis=1, keepdims=True)
    score_fn = _exact_delta_score(sde, x0)

    key = jax.random.PRNGKey(0)
    for t_hi, t_lo in [(1.0, 0.52), (0.52, 0.03)]:
        t = jnp.full((b,), t_hi, jnp.float32)
        t_next = jnp.full((b,), t_lo, jnp.float32)
        mean, L = sde.marginal_prob(x0, t, mix)
        z = jax.random.normal(key, x0.shape, x0.dtype)
        x_t = mean + sde.mult_std(L, z)

        pred = data_prediction(sde, score_fn, x_t, t, mix)
        np.testing.assert_allclose(np.asarray(pred), np.asarray(x0),
                                   rtol=5e-4, atol=5e-5)

        for substeps in (1, 2, 4):
            x_end, _ = ddim_transport(
                sde, score_fn, x_t, t, t_next, mix, substeps
            )
            target = invert_ddim_x0(sde, x_t, t, t_next, x_end)
            np.testing.assert_allclose(np.asarray(target), np.asarray(x0),
                                       rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("on_policy", [0.0, 1.0])
def test_distill_loss_zero_at_fixed_point(on_policy):
    """Student == teacher == exact score -> x0_pred == x0_target pointwise
    and the loss vanishes (incl. the is_last branch, the prior-at-T
    mixing, and the on-policy trajectory inputs — the exact score maps
    ANY input back to x0, so the fixed point holds on-policy too)."""
    sde = MixSDE(N=8)
    rng = _rng()
    b, n = 16, 256
    x0 = jnp.asarray(0.1 * rng.standard_normal((b, 2, n)), jnp.float32)
    mix = x0.sum(axis=1, keepdims=True)
    score_fn = _exact_delta_score(sde, x0)
    cfg = DistillConfig(n_student=4, t_eps=0.03, teacher_substeps=2,
                        source_order="none", weighting="none",
                        on_policy_frac=on_policy)
    loss = distill_loss(
        jax.random.PRNGKey(3), sde, score_fn, score_fn, mix, x0, cfg
    )
    assert float(loss) < 1e-6


def test_snr_weights_floor_and_monotone():
    sde = MixSDE(N=8)
    t = jnp.linspace(0.03, 1.0, 16)
    w1, w2 = snr_channel_weights(sde, t)
    assert np.all(np.asarray(w1) >= 1.0) and np.all(np.asarray(w2) >= 1.0)
    # SNR decays as noise grows: weights non-increasing in t (weights are
    # (b, 1, 1)-shaped; the batch axis is the time sweep here)
    assert np.all(np.diff(np.asarray(w1), axis=0) <= 1e-6)
    assert np.all(np.diff(np.asarray(w2), axis=0) <= 1e-6)


def test_snr_weights_priormix_envelope():
    """PriorMixSDE's marginal std is env * sqrt(ev_k) (mixsde.py:_std) and
    the envelope does NOT cancel in a plain SNR: sigma^2 = env^2 ev_k, so
    above the truncation floor the weights must scale as 1/env^2 — a
    4x-hotter mixture (env 2x) quarters both weights."""
    sde = PriorMixSDE(N=8, avg_len=8)
    b, s = 3, 64
    mix = jnp.asarray(_rng().standard_normal((b, 1, s)), jnp.float32) * 0.05
    t = jnp.full((b,), 0.1, jnp.float32)
    w1, w2 = snr_channel_weights(sde, t, mix)
    w1_hot, w2_hot = snr_channel_weights(sde, t, 2.0 * mix)
    env2 = np.asarray(sde._std_sigma_mix(mix)) ** 2
    ev1, ev2 = sde._cov_eigval(t)
    exact1 = np.maximum(1.0 / (env2 * np.asarray(ev1)[:, None, None]), 1.0)
    np.testing.assert_allclose(np.asarray(w1), exact1, rtol=1e-5)
    above = np.asarray(w1) > 4.0  # floor can't bite after a /4
    np.testing.assert_allclose(
        np.asarray(w1_hot)[above], (np.asarray(w1) / 4.0)[above], rtol=2e-4
    )
    above2 = np.asarray(w2) > 4.0
    np.testing.assert_allclose(
        np.asarray(w2_hot)[above2], (np.asarray(w2) / 4.0)[above2], rtol=2e-4
    )
    assert above.any() and above2.any()  # the comparison actually engaged
    # MixSDE (no envelope): cond must be a no-op
    m = MixSDE(N=8)
    a1, a2 = snr_channel_weights(m, t)
    b1, b2 = snr_channel_weights(m, t, mix)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(b1))
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(b2))


def test_distill_ema_gates_on_applied_steps():
    """Under optax.MultiSteps accumulation the EMA must advance only on
    APPLIED optimizer steps (same contract as trainer.make_train_step,
    pl_model.py:611-614): an unconditional per-mini-step update would run
    the (1+n)/(10+n) bias-correction ramp twice as fast and decay the
    shadow toward unchanged params."""
    import optax

    from diffsep_tpu.train.distill import make_distill_step
    from diffsep_tpu.train.trainer import OptimConfig, init_train_state

    sde = MixSDE(N=8)
    params = {"w": jnp.ones((2, 2), jnp.float32)}

    def score_apply(p, x, t, mix):
        # nonlinear AND unit-scale on purpose: an affine score is exactly
        # DDIM-self-consistent (teacher micro-steps invert back onto the
        # student's own x0_hat -> loss identically zero), and a weak score
        # leaves the consistency error below f32 resolution around w=1
        return jnp.tanh(jnp.einsum("cd,bdt->bct", p["w"], x))

    tx = optax.MultiSteps(optax.sgd(1.0), every_k_schedule=2)
    optim_cfg = OptimConfig(accumulate_grad_batches=2)
    cfg = DistillConfig(n_student=2, t_eps=0.03, source_order="none",
                        weighting="none")
    step_fn = make_distill_step(
        score_apply, sde, tx, None, optim_cfg, jax.random.PRNGKey(0), cfg
    )
    state = init_train_state(params, tx, None)
    rng = _rng()
    # batch big enough that some rows draw a NON-last grid step: last-step
    # rows regress onto the teacher's own x0_hat, which is gradient-free
    # while student == teacher
    x0 = jnp.asarray(rng.standard_normal((8, 2, 32)), jnp.float32)
    mix = x0.sum(axis=1, keepdims=True)

    state, _ = step_fn(state, params, mix, x0)  # mini-step: NOT applied
    assert int(state.ema.num_updates) == 0
    np.testing.assert_array_equal(
        np.asarray(state.ema.params["w"]), np.asarray(params["w"])
    )
    state, _ = step_fn(state, params, mix, x0)  # applied optimizer step
    assert int(state.ema.num_updates) == 1
    assert not np.array_equal(
        np.asarray(state.ema.params["w"]), np.asarray(params["w"])
    )


@pytest.mark.parametrize("schedule", [None, "log"])
def test_serving_grid_matches_pc_sample(schedule):
    """The distillation grid IS pc_sample's ddim grid (for the default AND
    the named schedules): unrolling data_prediction + ddim_transition over
    make_timesteps' grid with pc_sample's own prior draw reproduces
    pc_sample(ddim, none, N, schedule) exactly — a distilled student
    serves through the stock sampler."""
    from diffsep_tpu.sampling.pc import make_timesteps

    sde = MixSDE(N=8)
    rng = _rng()
    b, n, N, eps = 2, 256, 4, 0.03
    x0 = jnp.asarray(0.1 * rng.standard_normal((b, 2, n)), jnp.float32)
    mix = x0.sum(axis=1, keepdims=True)
    score_fn = _exact_delta_score(sde, x0)

    key = jax.random.PRNGKey(7)
    got, nfe = pc_sample(
        key, sde, score_fn, mix, "ddim", "none", N=N, eps=eps,
        schedule=schedule,
    )
    assert nfe == N

    # replicate pc_sample's key discipline (pc.py:116-117), then unroll
    _, prior_key = jax.random.split(key)
    x = sde.copy(N=N).prior_sampling(prior_key, mix)
    ts, _ = make_timesteps(sde.T, eps, N, schedule)
    x0_hat = None
    for i in range(N):
        t = jnp.full((b,), ts[i], jnp.float32)
        t_next = jnp.full((b,), ts[min(i + 1, N - 1)], jnp.float32)
        x0_hat = data_prediction(sde, score_fn, x, t, mix)
        x = ddim_transition(sde, x, t, t_next, x0_hat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x0_hat),
                               rtol=1e-5, atol=1e-6)


TINY = [
    "model.score_model.backbone_args.nf=8",
    "model.score_model.backbone_args.ch_mult=[1,2]",
    "model.score_model.backbone_args.num_res_blocks=1",
    "model.score_model.backbone_args.attn_resolutions=[16]",
    "model.score_model.backbone_args.image_size=64",
    "model.score_model.stft_args.n_fft=126",
    "model.score_model.stft_args.hop_length=32",
    "model.optimizer.lr=0.001",
]


@pytest.fixture(scope="module")
def tiny_model():
    from diffsep_tpu.config import compose
    from diffsep_tpu.model import DiffSepModel

    cfg = compose(TINY)
    model = DiffSepModel(cfg)
    rng = _rng()
    tgt = jnp.asarray(0.1 * rng.standard_normal((2, 2, 2048)), jnp.float32)
    mix = tgt.sum(axis=1, keepdims=True)
    params = model.init_params(jax.random.PRNGKey(0), mix, tgt)
    return model, params, mix, tgt


@pytest.mark.slow
def test_distill_step_runs_and_reduces_loss(tiny_model):
    """The jitted distillation step trains a real (tiny) NCSN++ student
    against a fixed teacher: loss drops on a fixed batch and the EMA/step
    bookkeeping advances like the score-training step's."""
    from diffsep_tpu.train.distill import init_student_state

    model, params, mix, tgt = tiny_model
    step_fn = jax.jit(
        model.make_distill_step(jax.random.PRNGKey(5), n_student=4),
        donate_argnums=(0,),
    )
    state = init_student_state(params, model.tx, model.clipper)
    losses = []
    for _ in range(25):
        state, metrics = step_fn(state, params, mix, tgt)
        losses.append(float(jax.device_get(metrics["distill/loss"])))
    assert int(jax.device_get(state.step)) == 25
    # noisy single-batch objective: compare first-5 vs last-5 means
    assert np.mean(losses[-5:]) < np.mean(losses[:5])

    # the on-policy variant (student-trajectory inputs) runs the same
    # jitted step shape and stays finite on a real network
    step_op = jax.jit(
        model.make_distill_step(
            jax.random.PRNGKey(6), n_student=4, on_policy_frac=0.5
        ),
        donate_argnums=(0,),
    )
    state_op = init_student_state(params, model.tx, model.clipper)
    for _ in range(2):
        state_op, m_op = step_op(state_op, params, mix, tgt)
        assert np.isfinite(float(jax.device_get(m_op["distill/loss"])))


@pytest.mark.slow
def test_progressive_distill_halving(tiny_model):
    """The halving driver returns EMA params per stage, each loadable into
    the stock ddim sampler at that stage's N."""
    model, params, mix, tgt = tiny_model
    out = progressive_distill(
        model,
        params,
        lambda step: (mix, tgt),
        stages=(2, 1),
        steps_per_stage=2,
        base_key=jax.random.PRNGKey(11),
    )
    assert set(out) == {2, 1}
    ref_tree = jax.tree_util.tree_structure(params)
    for n, p in out.items():
        assert jax.tree_util.tree_structure(p) == ref_tree
        est, nfe = model.separate(
            p, jax.random.PRNGKey(0), mix,
            predictor_name="ddim", corrector_name="none", N=n,
        )
        assert est.shape == tgt.shape and nfe == n
        assert np.all(np.isfinite(np.asarray(est)))


@pytest.mark.slow
def test_distill_step_dp_matches_replicated(tiny_model):
    """Data-parallel distillation needs no new code: the jitted step on a
    dp mesh (batch sharded, state/teacher replicated) computes the same
    loss and the same updated params as the single-device run — XLA
    inserts the gradient reduction from the sharding annotations, like
    the score-training step (parallel/mesh.py)."""
    from diffsep_tpu.parallel.mesh import (
        make_mesh,
        replicate_global,
        shard_batch,
    )
    from diffsep_tpu.train.distill import init_student_state

    model, params, mix, tgt = tiny_model
    step_fn = jax.jit(model.make_distill_step(jax.random.PRNGKey(5),
                                              n_student=4))
    state = init_student_state(params, model.tx, model.clipper)
    s_rep, m_rep = step_fn(state, params, mix, tgt)

    mesh = make_mesh(2)
    state_sh = replicate_global(init_student_state(params, model.tx,
                                                   model.clipper), mesh)
    teacher_sh = replicate_global(params, mesh)
    s_dp, m_dp = step_fn(state_sh, teacher_sh, shard_batch(mix, mesh),
                         shard_batch(tgt, mesh))

    np.testing.assert_allclose(
        float(m_dp["distill/loss"]), float(m_rep["distill/loss"]),
        rtol=1e-5,
    )
    flat_rep = jax.tree_util.tree_leaves(jax.device_get(s_rep.params))
    flat_dp = jax.tree_util.tree_leaves(jax.device_get(s_dp.params))
    for a, b in zip(flat_rep, flat_dp):
        np.testing.assert_allclose(b, a, rtol=5e-4, atol=1e-6)


@pytest.mark.slow
def test_progressive_distill_stage_cache_resumes(tiny_model, tmp_path):
    """stage_cache_dir makes the halving schedule resumable: a rerun loads
    each finished stage's EMA params instead of re-training (the batch_fn
    of the rerun would raise if any stage actually trained), and returns
    trees identical to the first run's. Motivation: axon-tunnel wedges +
    watchdog relaunches must lose at most one stage."""
    model, params, mix, tgt = tiny_model
    cache = tmp_path / "stages"
    out1 = progressive_distill(
        model,
        params,
        lambda step: (mix, tgt),
        stages=(2, 1),
        steps_per_stage=2,
        base_key=jax.random.PRNGKey(11),
        stage_cache_dir=str(cache),
    )
    assert sorted(p.name for p in cache.iterdir()) == [
        "stage0_N2.msgpack", "stage1_N1.msgpack",
    ]

    def boom(step):
        raise AssertionError("cached stage must not re-train")

    out2 = progressive_distill(
        model,
        params,
        boom,
        stages=(2, 1),
        steps_per_stage=2,
        base_key=jax.random.PRNGKey(11),
        stage_cache_dir=str(cache),
    )
    assert set(out2) == set(out1) == {2, 1}
    for n in out1:
        a = jax.tree_util.tree_leaves(jax.device_get(out1[n]))
        b = jax.tree_util.tree_leaves(jax.device_get(out2[n]))
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
