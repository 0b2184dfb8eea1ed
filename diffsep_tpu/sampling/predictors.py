"""Reverse-SDE predictors.

Capability parity with sdes/predictors.py (Predictor ABC + registry,
EulerMaruyama, ReverseDiffusion, None). Functional redesign: `update` takes
an explicit PRNG key and optional per-step dt and returns (x, x_mean); no
hidden RNG or device state.
"""
from __future__ import annotations

from typing import Callable

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
    does NOT give low-NFE wins here — a DPM-Solver-style exponential
    integrator in log-SNR time would (future work, see PAPERS.md); the
    stochastic reverse_diffusion+ald2 pair remains the production choice."""

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
        sde = self.sde
        score = self.score_fn(x, t, cond)
        L = sde.marginal_prob(x, t, cond)[1]
        sigma_score = sde.mult_std(L, sde.mult_std(L, score))  # Sigma s
        x0_hat = sde.apply_mean_inv(t, x + sigma_score)
        resid = x - sde.apply_mean(t, x0_hat)
        x_next = sde.apply_mean(t_next, x0_hat) + sde.apply_std_ratio(
            t_next, t, resid
        )
        return x_next, x0_hat


@PredictorRegistry.register("none")
class NonePredictor(Predictor):
    def __init__(self, *args, **kwargs):
        pass

    def update(self, key, x, t, cond, dt=None, t_next=None):
        return x, x
