"""Ornstein-Uhlenbeck SDEs (SGMSE lineage) for speech enhancement.

Capability parity with `OUVESDE` (sdes/sdes.py:593-692) and `OUVPSDE`
(sdes/sdes.py:695-780).  OUVP is kept for API parity but — as the reference
itself warns (sdes.py:697,722) — is unstable around t=0.2 and unused.

Unlike the reference (which hard-codes 4-D spectrogram states via
``std[:, None, None, None]``), std broadcasting here is rank-agnostic.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from .base import SDE, SDERegistry, batch_broadcast

Array = jax.Array


@SDERegistry.register("ouve")
@dataclasses.dataclass(frozen=True)
class OUVESDE(SDE):
    """OU variance-exploding SDE: dx = theta (y - x) dt + sigma(t) dw."""

    theta: float = 1.5
    sigma_min: float = 0.05
    sigma_max: float = 0.5
    N: int = 1000

    @property
    def logsig(self) -> float:
        return math.log(self.sigma_max / self.sigma_min)

    def sde(self, x: Array, t: Array, cond: Array) -> Tuple[Array, Array]:
        drift = self.theta * (cond - x)
        sigma = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        diffusion = sigma * math.sqrt(2.0 * self.logsig)
        return drift, diffusion

    def _mean(self, x0: Array, t: Array, y: Array) -> Array:
        e = batch_broadcast(jnp.exp(-self.theta * t), x0)
        return e * x0 + (1.0 - e) * y

    def _std(self, t: Array) -> Array:
        s, th, lg = self.sigma_min, self.theta, self.logsig
        return jnp.sqrt(
            (s**2 * jnp.exp(-2 * th * t) * (jnp.exp(2 * (th + lg) * t) - 1) * lg)
            / (th + lg)
        )

    def marginal_prob(self, x0: Array, t: Array, cond: Array) -> Tuple[Array, Array]:
        return self._mean(x0, t, cond), self._std(t)

    def prior_sampling(self, key: jax.Array, cond: Array) -> Array:
        std = self._std(jnp.ones((cond.shape[0],), cond.dtype))
        z = jax.random.normal(key, cond.shape, cond.dtype)
        return cond + batch_broadcast(std, cond) * z

    def prior_logp(self, z: Array) -> Array:
        raise NotImplementedError("prior_logp for OU SDE not yet implemented")


@SDERegistry.register("ouvp")
@dataclasses.dataclass(frozen=True)
class OUVPSDE(SDE):
    """OU variance-preserving SDE (unused by recipes; parity only).

    dx = 1/2 beta(t) stiffness (y - x) dt + sqrt(beta(t)) dw,
    beta(t) = beta_min + t (beta_max - beta_min).
    """

    beta_min: float = 0.01
    beta_max: float = 1.0
    stiffness: float = 1.0
    N: int = 1000

    def _beta(self, t: Array) -> Array:
        return self.beta_min + t * (self.beta_max - self.beta_min)

    def sde(self, x: Array, t: Array, cond: Array) -> Tuple[Array, Array]:
        drift = (
            0.5
            * self.stiffness
            * batch_broadcast(self._beta(t), x)
            * (cond - x)
        )
        diffusion = jnp.sqrt(self._beta(t))
        return drift, diffusion

    def _mean(self, x0: Array, t: Array, y: Array) -> Array:
        b0, b1, s = self.beta_min, self.beta_max, self.stiffness
        fac = batch_broadcast(
            jnp.exp(-0.25 * s * t * (t * (b1 - b0) + 2 * b0)), x0
        )
        return y + fac * (x0 - y)

    def _std(self, t: Array) -> Array:
        b0, b1, s = self.beta_min, self.beta_max, self.stiffness
        return (1.0 - jnp.exp(-0.5 * s * t * (t * (b1 - b0) + 2 * b0))) / s

    def marginal_prob(self, x0: Array, t: Array, cond: Array) -> Tuple[Array, Array]:
        return self._mean(x0, t, cond), self._std(t)

    def prior_sampling(self, key: jax.Array, cond: Array) -> Array:
        std = self._std(jnp.ones((cond.shape[0],), cond.dtype))
        z = jax.random.normal(key, cond.shape, cond.dtype)
        return cond + batch_broadcast(std, cond) * z

    def prior_logp(self, z: Array) -> Array:
        raise NotImplementedError("prior_logp for OU SDE not yet implemented")
