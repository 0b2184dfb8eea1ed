"""SDE abstractions for score-based diffusion, designed for JAX.

Capability parity with the reference's `SDE` ABC and reverse-SDE machinery
(sdes/sdes.py:43-177), redesigned functionally:

* SDEs are immutable, hashable dataclasses — safe to close over in jit or to
  pass as static arguments; no device state (`send_to`) is needed because
  constants are baked at trace time.
* Randomness is explicit: `prior_sampling` takes a PRNG key.
* The reverse-time SDE is not a dynamically-built class (reference
  sdes.py:109-173) but two pure functions, `reverse_sde` and
  `reverse_discretize`, parameterized by the score function.

Shape conventions (time domain): state x is (batch, n_src, n_samples); time
t is (batch,); the conditioning signal `cond` is the mixture (batch, 1 or
n_src, n_samples).  `marginal_prob` returns (mean, L) where L is whatever
the SDE's `mult_std` / `mult_std_inv` understand (a matrix square-root of
the covariance).
"""
from __future__ import annotations

import abc
import dataclasses
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from ..utils.registry import Registry

SDERegistry = Registry("SDE")

Array = jax.Array
ScoreFn = Callable[..., Array]  # score_fn(x, t, cond) -> score


def batch_broadcast(a: Array, x: Array) -> Array:
    """Reshape a (batch,) vector so it broadcasts over all non-batch dims of x.

    Parity with sdes/sdes.py:24-40.
    """
    a = jnp.asarray(a)
    a = a.reshape((a.shape[0] if a.ndim else 1,))
    return a.reshape((-1,) + (1,) * (x.ndim - 1))


@dataclasses.dataclass(frozen=True)
class SDE(abc.ABC):
    """Abstract forward SDE: dx = f(x, t) dt + g(t) dw."""

    N: int = 1000

    @property
    def T(self) -> float:
        """End time of the SDE."""
        return 1.0

    @abc.abstractmethod
    def sde(self, x: Array, t: Array, cond: Array) -> Tuple[Array, Array]:
        """Drift and diffusion of the forward SDE."""

    @abc.abstractmethod
    def marginal_prob(self, x0: Array, t: Array, cond: Array) -> Tuple[Array, Any]:
        """Mean and std-operator L of the marginal p_t(x | x0, cond)."""

    @abc.abstractmethod
    def prior_sampling(self, key: jax.Array, cond: Array) -> Array:
        """Sample from the prior p_T(x | cond)."""

    # --- std-operator algebra (overridden by matrix-valued SDEs) ---
    @staticmethod
    def mult_std(L: Any, x: Array) -> Array:
        return batch_broadcast(L, x) * x if jnp.ndim(L) <= 1 else L @ x

    @staticmethod
    def mult_std_inv(L: Any, x: Array) -> Array:
        if jnp.ndim(L) <= 1:
            return x / batch_broadcast(L, x)
        return jnp.linalg.solve(L, x)

    def discretize(
        self, x: Array, t: Array, cond: Array, dt: float | None = None
    ) -> Tuple[Array, Array]:
        """Euler–Maruyama discretization x_{i+1} = x_i + f_i + G_i z.

        Parity with sdes/sdes.py:93-107 (including its quirk that a `dt`
        keyword is accepted; here it actually takes effect, whereas the
        reference's getattr-on-dict always returned 1/N).
        """
        if dt is None:
            dt = 1.0 / self.N
        drift, diffusion = self.sde(x, t, cond)
        return drift * dt, diffusion * jnp.sqrt(jnp.asarray(dt, x.dtype))

    def copy(self, **updates) -> "SDE":
        return dataclasses.replace(self, **updates)

    def reverse(self, score_fn: ScoreFn, probability_flow: bool = False):
        """Object-style reverse-SDE API (parity with sdes/sdes.py:109-173).

        Returns an object with `.sde`, `.rsde_parts` and `.discretize`
        mirroring the reference's dynamically-built RSDE; `reverse_sde` /
        `reverse_discretize` are the underlying pure functions."""
        return ReverseSDE(self, score_fn, probability_flow)


class ReverseSDE:
    """Reverse-time SDE/ODE view of a forward SDE (RSDE parity,
    sdes/sdes.py:121-173)."""

    def __init__(self, sde: SDE, score_fn: ScoreFn, probability_flow: bool = False):
        self.forward_sde = sde
        self.score_fn = score_fn
        self.probability_flow = probability_flow
        self.N = sde.N
        self.T = sde.T

    def sde(self, x: Array, t: Array, cond: Array):
        return reverse_sde(
            self.forward_sde, self.score_fn, x, t, cond, self.probability_flow
        )

    def rsde_parts(self, x: Array, t: Array, cond: Array):
        """All parts of the reverse drift (sdes/sdes.py:139-161)."""
        sde_drift, sde_diffusion = self.forward_sde.sde(x, t, cond)
        score = self.score_fn(x, t, cond)
        g2 = _square_bcast(sde_diffusion, x)
        score_drift = -g2 * score * (0.5 if self.probability_flow else 1.0)
        diffusion = (
            jnp.zeros_like(sde_diffusion)
            if self.probability_flow
            else sde_diffusion
        )
        return {
            "total_drift": sde_drift + score_drift,
            "diffusion": diffusion,
            "sde_drift": sde_drift,
            "sde_diffusion": sde_diffusion,
            "score_drift": score_drift,
            "score": score,
        }

    def discretize(self, x: Array, t: Array, cond: Array, dt=None):
        return reverse_discretize(
            self.forward_sde,
            self.score_fn,
            x,
            t,
            cond,
            dt=dt,
            probability_flow=self.probability_flow,
        )


def reverse_sde(
    sde: SDE,
    score_fn: ScoreFn,
    x: Array,
    t: Array,
    cond: Array,
    probability_flow: bool = False,
) -> Tuple[Array, Array]:
    """Drift and diffusion of the reverse-time SDE/ODE.

    Parity with RSDE.sde / rsde_parts (sdes/sdes.py:130-161):
      reverse drift = f - g^2 * score * (1/2 if probability_flow)
      reverse diffusion = 0 if probability_flow else g
    """
    drift, diffusion = sde.sde(x, t, cond)
    score = score_fn(x, t, cond)
    g2 = _square_bcast(diffusion, x)
    score_drift = -g2 * score * (0.5 if probability_flow else 1.0)
    rev_diffusion = jnp.zeros_like(diffusion) if probability_flow else diffusion
    return drift + score_drift, rev_diffusion


def reverse_discretize(
    sde: SDE,
    score_fn: ScoreFn,
    x: Array,
    t: Array,
    cond: Array,
    dt: float | None = None,
    probability_flow: bool = False,
    score: Array | None = None,
) -> Tuple[Array, Array]:
    """Discretized reverse iteration (RSDE.discretize, sdes/sdes.py:163-171).

    Returns (rev_f, rev_G) with x_mean = x - rev_f; x = x_mean + rev_G * z.
    `score` may be precomputed to share a network evaluation.
    """
    f, G = sde.discretize(x, t, cond, dt=dt)
    if score is None:
        score = score_fn(x, t, cond)
    rev_f = f - _square_bcast(G, x) * score * (0.5 if probability_flow else 1.0)
    rev_G = jnp.zeros_like(G) if probability_flow else G
    return rev_f, rev_G


def _square_bcast(g: Array, x: Array) -> Array:
    """g**2 padded with trailing singleton dims to broadcast over x."""
    g = jnp.asarray(g)
    pad = (1,) * (x.ndim - g.ndim)
    return (g**2).reshape(g.shape + pad)
