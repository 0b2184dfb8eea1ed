"""Reverse-SDE predictors.

Capability parity with sdes/predictors.py (Predictor ABC + registry,
EulerMaruyama, ReverseDiffusion, None). Functional redesign: `update` takes
an explicit PRNG key and optional per-step dt and returns (x, x_mean); no
hidden RNG or device state.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..sde.base import SDE, reverse_discretize, reverse_sde
from ..utils.registry import Registry

PredictorRegistry = Registry("Predictor")

Array = jax.Array


def _pad_like(g: Array, x: Array) -> Array:
    g = jnp.asarray(g)
    return g.reshape(g.shape + (1,) * (x.ndim - g.ndim))


class Predictor:
    """One reverse-time integration step (predictors.py:10-36).

    `t_next` is the next grid time (used by integrators that step between
    exact marginals, e.g. "ddim"); step-size-based predictors ignore it.
    """

    def __init__(self, sde: SDE, score_fn: Callable, probability_flow: bool = False):
        self.sde = sde
        self.score_fn = score_fn
        self.probability_flow = probability_flow

    def update(self, key, x, t, cond, dt=None, t_next=None):
        raise NotImplementedError


@PredictorRegistry.register("euler_maruyama")
class EulerMaruyamaPredictor(Predictor):
    def update(self, key, x, t, cond, dt=None, t_next=None):
        if dt is None:
            dt = 1.0 / self.sde.N
        dt = -dt
        z = jax.random.normal(key, x.shape, x.dtype)
        f, g = reverse_sde(
            self.sde, self.score_fn, x, t, cond, self.probability_flow
        )
        x_mean = x + f * dt
        x = x_mean + _pad_like(g, x) * jnp.sqrt(-dt) * z
        return x, x_mean


@PredictorRegistry.register("reverse_diffusion")
class ReverseDiffusionPredictor(Predictor):
    def update(self, key, x, t, cond, dt=None, t_next=None):
        rev_f, rev_g = reverse_discretize(
            self.sde,
            self.score_fn,
            x,
            t,
            cond,
            dt=dt,
            probability_flow=self.probability_flow,
        )
        z = jax.random.normal(key, x.shape, x.dtype)
        x_mean = x - rev_f
        x = x_mean + _pad_like(rev_g, x) * z
        return x, x_mean


@PredictorRegistry.register("heun")
class HeunPredictor(Predictor):
    """Second-order Heun step on the probability-flow ODE (deterministic;
    pair with corrector "none"). Beyond-reference extra sampler.

    Caveat measured on MixSDE: the pf-ODE is stiff near t -> eps (the score
    scales like 1/Sigma(t)), so explicit Heun needs large N to converge and
    does NOT give low-NFE wins here — the "dpmpp" predictor below is the
    exponential-integrator answer (exact transitions + second-order
    multistep in log-SNR time); the stochastic reverse_diffusion+ald2 pair
    remains the production choice for quality."""

    def update(self, key, x, t, cond, dt=None, t_next=None):
        if dt is None:
            dt = 1.0 / self.sde.N
        dt = -dt  # reverse time

        def drift(x, t):
            d, _ = reverse_sde(
                self.sde, self.score_fn, x, t, cond, probability_flow=True
            )
            return d

        d1 = drift(x, t)
        x_euler = x + d1 * dt
        # clamp the endpoint time: the final step would otherwise evaluate
        # below t=0 where the marginal std is undefined
        t_end = jnp.maximum(t + dt, 1e-4)
        d2 = drift(x_euler, t_end)
        x_next = x + 0.5 * dt * (d1 + d2)
        return x_next, x_next


def data_prediction(sde, score_fn, x, t, cond):
    """x0_hat = M(t)^{-1} (x + Sigma(t) score) — the DDIM data prediction.

    Module-level so train/distill.py regresses onto the SAME algebra the
    serving predictor runs (distilled-student/serving equivalence must not
    depend on two copies staying in sync)."""
    score = score_fn(x, t, cond)
    L = sde.marginal_prob(x, t, cond)[1]
    sigma_score = sde.mult_std(L, sde.mult_std(L, score))  # Sigma s
    return sde.apply_mean_inv(t, x + sigma_score)


def ddim_transition(sde, x, t, t_next, x0_hat):
    """Exact marginal-to-marginal transport given a data prediction:
    x_{t'} = M(t') x0_hat + L(t') L(t)^{-1} (x - M(t) x0_hat)."""
    resid = x - sde.apply_mean(t, x0_hat)
    return sde.apply_mean(t_next, x0_hat) + sde.apply_std_ratio(
        t_next, t, resid
    )


@PredictorRegistry.register("ddim")
class DDIMPredictor(Predictor):
    """Exact Gaussian-transition (DDIM-style) deterministic step —
    beyond-reference fast sampler for the mixing SDE family.

    Uses the closed-form marginal structure of MixSDE/PriorMixSDE: estimate
    the data prediction x0_hat = M(t)^{-1} (x + Sigma(t) score) and map the
    residual between exact marginals,

        x_{t'} = M(t') x0_hat + L(t') L(t)^{-1} (x - M(t) x0_hat).

    With an exact score this is exact in distribution for ANY step count
    (the analytic-score test recovers the sources with N=3), so it is the
    low-NFE serving sampler: pair with corrector "none" and small N. The
    denoised output (x_mean) is x0_hat itself.
    """

    def update(self, key, x, t, cond, dt=None, t_next=None):
        if t_next is None:
            raise ValueError("ddim predictor needs grid times (t_next)")
        x0_hat = data_prediction(self.sde, self.score_fn, x, t, cond)
        x_next = ddim_transition(self.sde, x, t, t_next, x0_hat)
        return x_next, x0_hat


def _lambda_channels(sde, t: Array) -> Tuple[Array, Array]:
    """Per-eigenchannel log-SNR lambda_k(t) = log(alpha_k(t) / sigma_k(t))
    for the mixing SDE family.

    The marginal mean/std operators are simultaneously diagonal in the
    {A, Pn} projector basis: along A, alpha_1 = 1 and sigma_1 = sqrt(ev1);
    along Pn, alpha_2 = exp(-d_lambda t) and sigma_2 = sqrt(ev2).
    PriorMixSDE's per-sample power envelope multiplies both sigmas by a
    time-independent constant, which cancels in every lambda DIFFERENCE —
    the only way these values are used.
    """
    ev1, ev2 = sde._cov_eigval(t)
    lam1 = -0.5 * jnp.log(ev1)
    lam2 = -sde.d_lambda * t - 0.5 * jnp.log(ev2)
    return lam1, lam2


@PredictorRegistry.register("dpmpp")
class DPMpp2MPredictor(Predictor):
    """DPM-Solver++(2M)-style multistep exact-transition step — beyond-
    reference low-NFE sampler (deterministic; pair with corrector "none").

    Same exact Gaussian transition as the "ddim" predictor, but the data
    prediction is extrapolated to second order from the PREVIOUS step's
    prediction (Lu et al. 2022, multistep variant — one NN eval per step):

        D_i = x0_i + c * (x0_i - x0_{i-1}),   c = h_i / (2 h_{i-1}),

    with h measured in log-SNR time. The mixing SDE family has TWO
    log-SNR clocks (one per {A, Pn} eigenchannel, see _lambda_channels),
    so the extrapolation coefficient is computed per channel — each
    channel gets its textbook scalar DPM-Solver++(2M) update exactly.

    With an exact score of a unimodal Gaussian marginal x0_i is constant
    in i, the correction vanishes, and this reduces to "ddim" (tested);
    with a learned score the second-order term cancels most of the
    leading truncation error at low N. First step runs plain "ddim"
    (no history yet).
    """

    has_state = True

    def init_state(self, x: Array):
        # (x0_prev, t_prev, history_valid); t_prev=1 keeps the (gated-off)
        # first-step lambda evaluations finite
        return (
            jnp.zeros_like(x),
            jnp.ones((x.shape[0],), x.dtype),
            jnp.zeros((), x.dtype),
        )

    def update(self, key, x, t, cond, dt=None, t_next=None, state=None):
        if t_next is None:
            raise ValueError("dpmpp predictor needs grid times (t_next)")
        from ..sde.mixsde import mix_mats

        sde = self.sde
        score = self.score_fn(x, t, cond)
        L = sde.marginal_prob(x, t, cond)[1]
        sigma_score = sde.mult_std(L, sde.mult_std(L, score))  # Sigma s
        x0_hat = sde.apply_mean_inv(t, x + sigma_score)

        x0_prev, t_prev, valid = state
        lam1, lam2 = _lambda_channels(sde, t)
        lam1n, lam2n = _lambda_channels(sde, t_next)
        lam1p, lam2p = _lambda_channels(sde, t_prev)

        def coef(lam, lam_next, lam_prev):
            h = lam_next - lam
            h_prev = lam - lam_prev
            safe = jnp.abs(h_prev) > 1e-12
            return valid * jnp.where(safe, h / jnp.where(safe, 2.0 * h_prev, 1.0), 0.0)

        c1 = coef(lam1, lam1n, lam1p)[:, None, None]
        c2 = coef(lam2, lam2n, lam2p)[:, None, None]
        A, Pn = mix_mats(x.shape[1], x.dtype)
        dx0 = x0_hat - x0_prev
        D = x0_hat + (c1 * A + c2 * Pn) @ dx0

        x_next = sde.apply_mean(t_next, D) + sde.apply_std_ratio(
            t_next, t, x - sde.apply_mean(t, D)
        )
        new_state = (x0_hat, t, jnp.ones((), x.dtype))
        return x_next, x0_hat, new_state


@PredictorRegistry.register("none")
class NonePredictor(Predictor):
    def __init__(self, *args, **kwargs):
        pass

    def update(self, key, x, t, cond, dt=None, t_next=None):
        return x, x
