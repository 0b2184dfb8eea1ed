"""Langevin correctors.

Capability parity with sdes/correctors.py (Corrector ABC + registry,
Langevin, AnnealedLangevinDynamics "ald", AnnealedLangevinDynamics2 "ald2",
None). "ald2" is the production corrector, hard-wired at every reference
call site (pl_model.py:158, separate.py:89, evaluate.py:364).

Functional redesign: explicit PRNG keys; the n_steps inner loop is a
`lax.fori_loop`-free static unroll (n_steps is 1 in every recipe) so XLA
sees a flat graph.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..sde.base import SDE
from ..sde.mixsde import MixSDE, PriorMixSDE
from ..utils.registry import Registry

CorrectorRegistry = Registry("Corrector")

Array = jax.Array


class Corrector:
    """Score-based corrector step (correctors.py:11-32)."""

    def __init__(self, sde: SDE, score_fn: Callable, snr: float, n_steps: int):
        self.sde = sde
        self.score_fn = score_fn
        self.snr = snr
        self.n_steps = n_steps

    def update(self, key, x, t, cond):
        raise NotImplementedError


@CorrectorRegistry.register("langevin")
class LangevinCorrector(Corrector):
    """SNR-scaled Langevin dynamics (correctors.py:35-55)."""

    def update(self, key, x, t, cond):
        x_mean = x
        for i in range(self.n_steps):
            grad = self.score_fn(x, t, cond)
            noise = jax.random.normal(
                jax.random.fold_in(key, i), x.shape, x.dtype
            )
            grad_norm = jnp.linalg.norm(
                grad.reshape(grad.shape[0], -1), axis=-1
            ).mean()
            noise_norm = jnp.linalg.norm(
                noise.reshape(noise.shape[0], -1), axis=-1
            ).mean()
            step_size = (self.snr * noise_norm / grad_norm) ** 2 * 2
            x_mean = x + step_size * grad
            x = x_mean + noise * jnp.sqrt(step_size * 2)
        return x, x_mean


@CorrectorRegistry.register("ald")
class AnnealedLangevinDynamics(Corrector):
    """NCSN-style annealed Langevin with scalarized std (correctors.py:58-91);
    MixSDE only."""

    def __init__(self, sde, score_fn, snr, n_steps):
        if not isinstance(sde, MixSDE):
            raise NotImplementedError(
                f"SDE class {type(sde).__name__} not supported by 'ald'"
            )
        super().__init__(sde, score_fn, snr, n_steps)

    def update(self, key, x, t, cond):
        x_mean = x
        L = self.sde.marginal_prob(x, t, cond)[1]
        # scalarize the sqrt-covariance: std of the first source
        # (correctors.py:79-82)
        std = jnp.sqrt((L @ L)[:, 0, :].sum(axis=-1, keepdims=True))
        std = std.reshape(std.shape + (1,) * (x.ndim - std.ndim))
        for i in range(self.n_steps):
            grad = self.score_fn(x, t, cond)
            noise = jax.random.normal(
                jax.random.fold_in(key, i), x.shape, x.dtype
            )
            step_size = (self.snr * std) ** 2 * 2
            x_mean = x + step_size * grad
            x = x_mean + noise * jnp.sqrt(step_size * 2)
        return x, x_mean


@CorrectorRegistry.register("ald2")
class AnnealedLangevinDynamics2(Corrector):
    """Matrix-std annealed Langevin — the production corrector
    (correctors.py:94-128): step = 2 snr^2 L L score, noise = 2 snr L z."""

    def __init__(self, sde, score_fn, snr, n_steps):
        if not isinstance(sde, (MixSDE, PriorMixSDE)):
            raise NotImplementedError(
                f"SDE class {type(sde).__name__} not supported by 'ald2'"
            )
        super().__init__(sde, score_fn, snr, n_steps)

    def update(self, key, x, t, cond):
        x_mean = x
        L = self.sde.marginal_prob(x, t, cond)[1]
        for i in range(self.n_steps):
            grad = self.score_fn(x, t, cond)
            noise = jax.random.normal(
                jax.random.fold_in(key, i), x.shape, x.dtype
            )
            step_size = 2.0 * self.snr**2
            grad = self.sde.mult_std(L, grad)
            grad = self.sde.mult_std(L, grad)
            x_mean = x + step_size * grad
            x = x_mean + self.sde.mult_std(2.0 * self.snr * L, noise)
        return x, x_mean


@CorrectorRegistry.register("none")
class NoneCorrector(Corrector):
    def __init__(self, *args, **kwargs):
        self.snr = 0.0
        self.n_steps = 0

    def update(self, key, x, t, cond):
        return x, x
