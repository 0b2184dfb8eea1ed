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
    """One reverse-time integration step (predictors.py:10-36)."""

    def __init__(self, sde: SDE, score_fn: Callable, probability_flow: bool = False):
        self.sde = sde
        self.score_fn = score_fn
        self.probability_flow = probability_flow

    def update(self, key, x, t, cond, dt=None):
        raise NotImplementedError


@PredictorRegistry.register("euler_maruyama")
class EulerMaruyamaPredictor(Predictor):
    def update(self, key, x, t, cond, dt=None):
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
    def update(self, key, x, t, cond, dt=None):
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

    def update(self, key, x, t, cond, dt=None):
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
        # clamp the midpoint time: the final step would otherwise evaluate
        # below t=0 where the marginal std is undefined
        t_next = jnp.maximum(t + dt, 1e-4)
        d2 = drift(x_euler, t_next)
        x_next = x + 0.5 * dt * (d1 + d2)
        return x_next, x_next


@PredictorRegistry.register("none")
class NonePredictor(Predictor):
    def __init__(self, *args, **kwargs):
        pass

    def update(self, key, x, t, cond, dt=None):
        return x, x
