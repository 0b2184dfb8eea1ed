"""PC sampler tests.

Key check: with the *analytic* score of the MixSDE Gaussian marginal,
the PC sampler must recover the true sources from the mixture — an
end-to-end validation of predictor + corrector + scan plumbing without a
neural network (SURVEY.md §4 item d).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsep_tpu.sampling import (
    CorrectorRegistry,
    PredictorRegistry,
    fibonaccispace,
    make_timesteps,
    ode_sample,
    pc_sample,
)
from diffsep_tpu.sde import MixSDE


def analytic_score(sde, x0):
    """Exact score of p_t(x | x0): -Sigma^{-1}(x - mean) with
    Sigma = L L^T and mean the closed-form marginal mean."""

    def score(x, t, cond):
        mean, L = sde.marginal_prob(x0, t, cond)
        # Sigma^{-1} = A/ev1 + Pn/ev2 via eigenstructure
        d = sde.mult_std_inv(L, sde.mult_std_inv(L, x - mean))
        return -d

    return score


def test_registries():
    for n in ["euler_maruyama", "reverse_diffusion", "heun", "none"]:
        assert n in PredictorRegistry
    for n in ["langevin", "ald", "ald2", "none"]:
        assert n in CorrectorRegistry


def test_ddim_exact_at_three_steps():
    """The DDIM-style exact-transition predictor recovers the sources with
    the analytic score at N=3 — 20 NN evals fewer than the production
    operating point (it is exact in distribution for Gaussian marginals)."""
    n = 128
    s1 = np.sin(2 * np.pi * 3 * np.arange(n) / n)
    s2 = 0.7 * np.cos(2 * np.pi * 6 * np.arange(n) / n)
    x0 = jnp.asarray(np.stack([s1, s2])[None].astype(np.float32))
    mix = x0.sum(axis=1, keepdims=True)
    for N in [3, 8]:
        sde = MixSDE(ndim=2, N=N)
        x, nfe = jax.jit(
            lambda k: pc_sample(
                k, sde, analytic_score(sde, x0), mix,
                predictor_name="ddim", corrector_name="none",
            )
        )(jax.random.PRNGKey(0))
        err = float(jnp.abs(x - x0).mean())
        assert err < 1e-3, (N, err)


def test_ddim_priormix():
    """DDIM works on PriorMixSDE too (envelope cancels in the ratios)."""
    from diffsep_tpu.sde import PriorMixSDE

    rng = np.random.default_rng(0)
    sde = PriorMixSDE(ndim=2, N=4, avg_len=16)
    x0 = jnp.asarray(rng.standard_normal((1, 2, 64)).astype(np.float32))
    mix = x0.sum(axis=1, keepdims=True)

    def score(x, t, cond):
        mean, L = sde.marginal_prob(x0, t, cond)
        return -sde.mult_std_inv(L, sde.mult_std_inv(L, x - mean))

    x, _ = pc_sample(
        jax.random.PRNGKey(1), sde, score, mix,
        predictor_name="ddim", corrector_name="none",
    )
    err = float(jnp.abs(x - x0).mean())
    assert err < 1e-2, err


def test_heun_runs_and_converges_with_n():
    """The deterministic Heun pf-ODE predictor runs and its error decreases
    with N (the pf-ODE is stiff near eps for MixSDE — see the predictor's
    docstring — so it needs large N; the SDE samplers are the production
    path)."""
    n = 128
    s1 = np.sin(2 * np.pi * 3 * np.arange(n) / n)
    s2 = 0.7 * np.cos(2 * np.pi * 6 * np.arange(n) / n)
    x0 = jnp.asarray(np.stack([s1, s2])[None].astype(np.float32))
    mix = x0.sum(axis=1, keepdims=True)

    def err(N):
        sde = MixSDE(ndim=2, N=N)
        x, _ = pc_sample(
            jax.random.PRNGKey(0), sde, analytic_score(sde, x0), mix,
            predictor_name="heun", corrector_name="none",
            probability_flow=True,
        )
        assert np.isfinite(np.asarray(x)).all()
        return float(jnp.abs(x - x0).mean())

    assert err(32) < err(8)


@pytest.mark.parametrize("corrector", ["ald2", "ald", "langevin"])
def test_pc_sampler_recovers_sources_with_analytic_score(corrector):
    rng = np.random.default_rng(0)
    sde = MixSDE(ndim=2, N=50)
    # smooth "sources"
    n = 256
    s1 = np.sin(2 * np.pi * 5 * np.arange(n) / n)
    s2 = np.sign(np.sin(2 * np.pi * 3 * np.arange(n) / n)) * 0.7
    x0 = jnp.asarray(np.stack([s1, s2])[None].astype(np.float32))
    mix = x0.sum(axis=1, keepdims=True)

    score_fn = analytic_score(sde, x0)
    x, nfe = jax.jit(
        lambda k: pc_sample(
            k, sde, score_fn, mix, "reverse_diffusion", corrector,
            snr=0.5, corrector_steps=1, eps=0.03,
        )
    )(jax.random.PRNGKey(3))
    assert nfe == 50 * 2
    err = np.abs(np.asarray(x) - np.asarray(x0)).mean()
    assert err < 0.1, f"PC sampler failed to track analytic score: {err}"


def test_pc_sampler_jit_once_scan(caplog):
    """The whole N-step loop is one compiled function (no per-step retrace):
    the score_fn is traced a constant number of times regardless of N."""
    sde = MixSDE(ndim=2, N=40)
    calls = []

    def counting_score(x, t, cond):
        calls.append(1)
        return -x

    mix = jnp.ones((1, 1, 64))
    jax.jit(
        lambda k: pc_sample(k, sde, counting_score, mix, N=40)
    )(jax.random.PRNGKey(0))
    # scan traces its body once; corrector+predictor each trace score once
    assert len(calls) <= 4, f"score_fn traced {len(calls)} times"


def test_scheduled_timesteps_match_torch():
    """Named schedules reproduce the reference's torch.linspace/logspace
    grids (sdes/__init__.py:92-109)."""
    import math

    import torch

    T, eps, N = 1.0, 0.03, 30
    for sched in ["linear", "log", "revlog"]:
        ts, dts = make_timesteps(T, eps, N, sched)
        if sched == "linear":
            grid = torch.linspace(T, eps, N + 1)
        elif sched == "log":
            grid = torch.logspace(
                math.log10(T), math.log10(eps), N + 1, base=10.0
            )
        else:
            grid = torch.logspace(
                math.log10(eps), math.log10(T), N + 1, base=10.0
            ).flip(dims=(0,))
        np.testing.assert_allclose(
            np.asarray(ts), grid[:-1].numpy(), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(dts), (grid[:-1] - grid[1:]).abs().numpy(), rtol=1e-4,
            atol=1e-7,
        )


def test_scheduled_timesteps():
    ts, dts = make_timesteps(1.0, 0.03, 30, None)
    assert ts.shape == (30,) and float(ts[0]) == 1.0
    np.testing.assert_allclose(np.asarray(dts), 1 / 30)
    for sched in ["linear", "log", "revlog"]:
        ts, dts = make_timesteps(1.0, 0.03, 30, sched)
        assert ts.shape == (30,) and dts.shape == (30,)
        t = np.asarray(ts)
        assert (np.diff(t) < 0).all(), f"{sched} timesteps must decrease"
        np.testing.assert_allclose(t[0], 1.0, rtol=1e-5)


def test_scheduled_sampler_runs():
    sde = MixSDE(ndim=2, N=10)
    mix = jnp.ones((1, 1, 32))
    x, nfe = pc_sample(
        jax.random.PRNGKey(0), sde, lambda x, t, c: -x, mix, schedule="log"
    )
    assert x.shape == (1, 2, 32) and np.isfinite(np.asarray(x)).all()


def test_intermediate_outputs():
    sde = MixSDE(ndim=2, N=5)
    mix = jnp.ones((1, 1, 16))
    x, nfe, ims = pc_sample(
        jax.random.PRNGKey(0), sde, lambda x, t, c: -x, mix, intermediate=True
    )
    assert ims.shape == (5, 2, 1, 2, 16)


def test_ode_sampler_rk4_tracks_analytic_score():
    rng = np.random.default_rng(1)
    sde = MixSDE(ndim=2, N=60)
    n = 128
    s1 = np.cos(2 * np.pi * 4 * np.arange(n) / n)
    s2 = 0.5 * np.sin(2 * np.pi * 7 * np.arange(n) / n)
    x0 = jnp.asarray(np.stack([s1, s2])[None].astype(np.float32))
    mix = x0.sum(axis=1, keepdims=True)
    x, nfe = ode_sample(
        jax.random.PRNGKey(0), sde, analytic_score(sde, x0), mix, method="rk4"
    )
    err = np.abs(np.asarray(x) - np.asarray(x0)).mean()
    assert err < 0.15, err


def test_ode_rk45_host_matches_rk4_device():
    """The host scipy RK45 path (reference parity) and the on-device RK4
    path solve the same probability-flow ODE."""
    sde = MixSDE(ndim=2, N=40)
    n = 64
    s1 = np.cos(2 * np.pi * 3 * np.arange(n) / n)
    s2 = 0.5 * np.sin(2 * np.pi * 5 * np.arange(n) / n)
    x0 = jnp.asarray(np.stack([s1, s2])[None].astype(np.float32))
    mix = x0.sum(axis=1, keepdims=True)
    score = analytic_score(sde, x0)
    key = jax.random.PRNGKey(5)
    x_rk4, _ = ode_sample(key, sde, score, mix, method="rk4")
    x_rk45, _ = ode_sample(key, sde, score, mix, method="rk45")
    np.testing.assert_allclose(
        np.asarray(x_rk4), np.asarray(x_rk45), atol=0.05
    )


def test_scheduled_linear_close_to_plain():
    """schedule='linear' (N+1 grid + explicit dt) and the plain sampler
    integrate the same reverse SDE — with the analytic score both recover
    the sources."""
    sde = MixSDE(ndim=2, N=50)
    n = 64
    s1 = np.sin(2 * np.pi * 4 * np.arange(n) / n)
    s2 = 0.6 * np.cos(2 * np.pi * 7 * np.arange(n) / n)
    x0 = jnp.asarray(np.stack([s1, s2])[None].astype(np.float32))
    mix = x0.sum(axis=1, keepdims=True)
    score = analytic_score(sde, x0)
    x_sched, _ = pc_sample(
        jax.random.PRNGKey(1), sde, score, mix, schedule="linear",
        snr=0.5, corrector_steps=1,
    )
    err = np.abs(np.asarray(x_sched) - np.asarray(x0)).mean()
    assert err < 0.1, err


def test_dpmpp_reduces_to_ddim_on_pointmass_score():
    """With a point-mass data distribution the data prediction x0_hat is
    constant across steps, the second-order extrapolation vanishes, and
    dpmpp must equal ddim EXACTLY step for step."""
    n = 128
    s1 = np.sin(2 * np.pi * 3 * np.arange(n) / n)
    s2 = 0.7 * np.cos(2 * np.pi * 6 * np.arange(n) / n)
    x0 = jnp.asarray(np.stack([s1, s2])[None].astype(np.float32))
    mix = x0.sum(axis=1, keepdims=True)
    sde = MixSDE(ndim=2, N=6)
    score = analytic_score(sde, x0)
    x_ddim, _ = pc_sample(
        jax.random.PRNGKey(0), sde, score, mix,
        predictor_name="ddim", corrector_name="none",
    )
    x_dpm, _ = pc_sample(
        jax.random.PRNGKey(0), sde, score, mix,
        predictor_name="dpmpp", corrector_name="none",
    )
    np.testing.assert_allclose(
        np.asarray(x_dpm), np.asarray(x_ddim), atol=2e-5
    )
    assert float(jnp.abs(x_dpm - x0).mean()) < 1e-3


def _gaussian_diff_score(sde, mu0, tau):
    """Analytic score for x0 = mu0 + tau * Pn w (randomness only in the
    difference channel, so the observed mixture stays consistent):
    Cov_t = ev1 A + (tau^2 e^{-2 d_lambda t} + ev2) Pn."""
    from diffsep_tpu.sde.mixsde import mix_mats

    def score(x, t, cond):
        A, Pn = mix_mats(sde.ndim, x.dtype)
        ev1, ev2 = sde._cov_eigval(t)
        v2 = tau**2 * jnp.exp(-2.0 * sde.d_lambda * t) + ev2
        Cinv = (1.0 / ev1)[:, None, None] * A + (1.0 / v2)[:, None, None] * Pn
        return -(Cinv @ (x - sde.apply_mean(t, mu0)))

    return score


def test_dpmpp_beats_ddim_at_low_nfe():
    """With a score whose data prediction MOVES across steps (Gaussian
    data in the difference channel), the multistep dpmpp predictor at
    N=4 lands closer to the fine-grid deterministic limit than ddim at
    N=4 — the point of the second-order extrapolation."""
    n = 64
    s1 = np.sin(2 * np.pi * 4 * np.arange(n) / n)
    s2 = 0.6 * np.cos(2 * np.pi * 7 * np.arange(n) / n)
    mu0 = jnp.asarray(np.stack([s1, s2])[None].astype(np.float32))
    mix = mu0.sum(axis=1, keepdims=True)
    tau = 0.5
    key = jax.random.PRNGKey(2)

    def run(pred, N):
        sde = MixSDE(ndim=2, N=N)
        x, _ = pc_sample(
            key, sde, _gaussian_diff_score(sde, mu0, tau), mix,
            predictor_name=pred, corrector_name="none",
        )
        return np.asarray(x)

    ref = run("ddim", 1024)
    # both integrators converge to the same deterministic flow (ddim is
    # first-order, so the shared limit is approached slowly from its side)
    assert np.abs(run("dpmpp", 16) - ref).mean() < 5e-3
    e_ddim = np.abs(run("ddim", 4) - ref).mean()
    e_dpm = np.abs(run("dpmpp", 4) - ref).mean()
    # measured on CPU: 0.091 vs 0.0048 — ~19x; assert a conservative 3x
    assert e_dpm < e_ddim / 3.0, (e_dpm, e_ddim)


def test_dpmpp_priormix():
    """dpmpp works on PriorMixSDE (the power envelope shifts both
    per-channel log-SNRs by a constant, which cancels in differences)."""
    from diffsep_tpu.sde import PriorMixSDE

    rng = np.random.default_rng(0)
    sde = PriorMixSDE(ndim=2, N=4, avg_len=16)
    x0 = jnp.asarray(rng.standard_normal((1, 2, 64)).astype(np.float32))
    mix = x0.sum(axis=1, keepdims=True)

    def score(x, t, cond):
        mean, L = sde.marginal_prob(x0, t, cond)
        return -sde.mult_std_inv(L, sde.mult_std_inv(L, x - mean))

    x, _ = pc_sample(
        jax.random.PRNGKey(1), sde, score, mix,
        predictor_name="dpmpp", corrector_name="none",
    )
    err = float(jnp.abs(x - x0).mean())
    assert err < 1e-2, err


def test_fibonaccispace():
    t = np.asarray(fibonaccispace(0.0, 1.0, 8))
    assert t.shape == (8,)
    assert t[0] == 0.0 and abs(t[-1] - 1.0) < 1e-6
    assert (np.diff(t) >= 0).all()
