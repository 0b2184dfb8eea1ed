"""Diffusion-mixing SDEs for source separation.

Capability parity with `MixSDE` (sdes/sdes.py:180-349) and `PriorMixSDE`
(sdes/sdes.py:352-590) — the SDEs whose marginal drifts the stacked clean
sources toward a Gaussian centered at their mixture:

    dx = -lambda * Pn x dt + sigma(t) * sqrt(2 log(sigma_max/sigma_min)) dw
    sigma(t) = sigma_min * (sigma_max / sigma_min)^t

with A = 11^T/n the averaging matrix and Pn = I - A its null-space projector.

TPU-first redesign notes
------------------------
* `mult_std_inv` exploits the closed-form eigenstructure: since
  L = a A + b Pn with A, Pn orthogonal projectors, L^{-1} = A/a + Pn/b —
  no `linalg.solve` (the reference solves a dense system, sdes.py:332).
* PriorMixSDE's per-sample 2x2 inverse (reference's manual solve,
  sdes.py:544-557) is kept as elementwise math — VPU-friendly.
* The variance-proportional time sampler replaces the host-side rejection
  loop (sdes.py:259-273) with a fixed-size inverse-CDF table lookup, which
  is jit-compatible and exact to table resolution.
* The mixture power envelope (avg_pool1d, sdes.py:477-489) is computed with
  a cumulative-sum sliding window instead of a length-510 convolution.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from .base import SDE, SDERegistry

Array = jax.Array


def mix_mats(ndim: int, dtype=jnp.float32) -> Tuple[Array, Array]:
    """Averaging matrix A = 11^T/n and null-space projector Pn = I - A."""
    A = jnp.full((1, ndim, ndim), 1.0 / ndim, dtype)
    Pn = jnp.eye(ndim, dtype=dtype)[None] - A
    return A, Pn


def _inv_cdf_times(key, n, t_eps, T, std_fn, table=1024):
    """Sample t in [t_eps, T] with density proportional to std_fn(t).

    jit-friendly inverse-CDF replacement for the reference's rejection
    sampler (sdes/sdes.py:259-273)."""
    grid = jnp.linspace(t_eps, T, table)
    w = std_fn(grid)
    cdf = jnp.cumsum(w)
    cdf = (cdf - cdf[0]) / (cdf[-1] - cdf[0])
    u = jax.random.uniform(key, (n,))
    return jnp.interp(u, cdf, grid)


@SDERegistry.register("mix")
@dataclasses.dataclass(frozen=True)
class MixSDE(SDE):
    """Variance-exploding diffusion-mixing SDE (sdes/sdes.py:180-349)."""

    ndim: int = 2
    d_lambda: float = 2.0
    sigma_min: float = 0.05
    sigma_max: float = 0.5
    N: int = 30

    @property
    def ratiosig(self) -> float:
        return self.sigma_max / self.sigma_min

    @property
    def logsig(self) -> float:
        return math.log(self.ratiosig)

    # --- forward SDE ---
    def sde(self, x: Array, t: Array, cond: Array) -> Tuple[Array, Array]:
        _, Pn = mix_mats(self.ndim, x.dtype)
        drift = -self.d_lambda * (Pn @ x)
        # the sqrt(2 logsig) factor makes the perturbation-kernel std
        # independent of logsig (see the integral of exp(2s) g(s)^2)
        sigma = self.sigma_min * self.ratiosig**t
        diffusion = sigma * math.sqrt(2.0 * self.logsig)
        return drift, diffusion

    # --- closed-form marginal ---
    def _mean_mix_mat(self, t: Array) -> Array:
        A, Pn = mix_mats(self.ndim)
        decay = jnp.exp(-t[:, None, None] * self.d_lambda)
        return A + decay * Pn

    def _cov_eigval(self, t: Array) -> Tuple[Array, Array]:
        mult = self.sigma_min**2
        s_ratio_power = self.ratiosig ** (2.0 * t)
        ev1 = mult * (s_ratio_power - 1.0)  # eigenvalue along A
        denom = 1.0 + self.d_lambda / self.logsig
        ev2 = mult * (s_ratio_power - jnp.exp(-2.0 * self.d_lambda * t)) / denom
        return ev1, ev2

    def _var(self, t: Array) -> Array:
        ev1, ev2 = self._cov_eigval(t)
        return 0.5 * (ev1 + ev2)

    def _std(self, t: Array) -> Array:
        A, Pn = mix_mats(self.ndim)
        ev1, ev2 = self._cov_eigval(t)
        return (
            jnp.sqrt(ev1)[:, None, None] * A + jnp.sqrt(ev2)[:, None, None] * Pn
        )

    def marginal_prob(self, x0: Array, t: Array, cond: Array) -> Tuple[Array, Array]:
        return self._mean_mix_mat(t) @ x0, self._std(t)

    # --- std-operator algebra (closed-form inverse via eigenstructure) ---
    @staticmethod
    def mult_std(L: Array, x: Array) -> Array:
        return L @ x

    def mult_std_inv(self, L: Array, x: Array) -> Array:
        # L = a A + b Pn  =>  L^{-1} = A/a + Pn/b; recover a, b from L:
        # row sums of L give a (A has unit row sums, Pn zero), and
        # a - b appears on the off-diagonal structure. Robust recovery:
        # a = mean row-sum; b = trace-based residual eigenvalue.
        n = L.shape[-1]
        a = L.sum(axis=-1).mean(axis=-1)  # (batch,)
        tr = jnp.trace(L, axis1=-2, axis2=-1)
        b = (tr - a) / (n - 1)
        A, Pn = mix_mats(n, x.dtype)
        Linv = (1.0 / a)[:, None, None] * A + (1.0 / b)[:, None, None] * Pn
        return Linv @ x

    # --- closed-form operators for exponential/DDIM-style integrators ---
    def mean_mat_inv(self, t: Array) -> Array:
        """(A + e^{-lambda t} Pn)^{-1} = A + e^{lambda t} Pn."""
        A, Pn = mix_mats(self.ndim)
        grow = jnp.exp(t[:, None, None] * self.d_lambda)
        return A + grow * Pn

    def apply_mean_inv(self, t: Array, x: Array) -> Array:
        return self.mean_mat_inv(t) @ x

    def apply_mean(self, t: Array, x: Array) -> Array:
        return self._mean_mix_mat(t) @ x

    def std_ratio(self, t_next: Array, t: Array) -> Array:
        """L(t_next) L(t)^{-1} = A sqrt(ev1'/ev1) + Pn sqrt(ev2'/ev2)."""
        A, Pn = mix_mats(self.ndim)
        ev1, ev2 = self._cov_eigval(t)
        ev1n, ev2n = self._cov_eigval(t_next)
        r1 = jnp.sqrt(ev1n / ev1)[:, None, None]
        r2 = jnp.sqrt(ev2n / ev2)[:, None, None]
        return r1 * A + r2 * Pn

    def apply_std_ratio(self, t_next: Array, t: Array, x: Array) -> Array:
        return self.std_ratio(t_next, t) @ x

    def prior_sampling(self, key: jax.Array, cond: Array) -> Array:
        """x_T = mix/ndim (broadcast over sources) + L(T) z (sdes.py:334-346)."""
        b, _, n_samples = cond.shape
        t = jnp.full((b,), self.T, cond.dtype)
        std = self._std(t)
        mean = jnp.broadcast_to(cond / self.ndim, (b, self.ndim, n_samples))
        z = jax.random.normal(key, mean.shape, mean.dtype)
        return mean + std @ z

    def prior_logp(self, z: Array) -> Array:
        raise NotImplementedError("prior_logp for the mixing SDE is not implemented")

    def sample_time_varprop(self, key: jax.Array, n: int, t_eps: float = 0.0) -> Array:
        return _inv_cdf_times(
            key, n, t_eps, self.T, lambda t: jnp.sqrt(self._var(t))
        )


@SDERegistry.register("priormix")
@dataclasses.dataclass(frozen=True)
class PriorMixSDE(SDE):
    """MixSDE with diffusion modulated by a local mixture-power envelope
    (sdes/sdes.py:352-590); used by the noise-reduction recipe
    (config/model/nr.yaml)."""

    ndim: int = 2
    d_lambda: float = 2.0
    sigma_min: float = 0.05
    sigma_max: float = 0.5
    N: int = 30
    avg_len: int = 510

    @property
    def ratiosig(self) -> float:
        return self.sigma_max / self.sigma_min

    @property
    def logsig(self) -> float:
        return math.log(self.ratiosig)

    # --- local mixture power envelope (sdes.py:477-489) ---
    def _std_sigma_mix(self, mix: Array) -> Array:
        """0.5 * sqrt(moving_avg(mix^2, avg_len)) with zero padding.

        Matches torch avg_pool1d(kernel=avg_len, stride=1, pad=avg_len//2,
        count_include_pad=True), trimmed to the input length.
        """
        k, p = self.avg_len, self.avg_len // 2
        sq = mix**2
        padded = jnp.pad(sq, [(0, 0)] * (sq.ndim - 1) + [(p, p)])
        cs = jnp.cumsum(padded, axis=-1, dtype=jnp.float32)
        cs = jnp.pad(cs, [(0, 0)] * (sq.ndim - 1) + [(1, 0)])
        n_out = mix.shape[-1] + 2 * p - k + 1
        win = (cs[..., k : k + n_out] - cs[..., :n_out]) / k
        win = win[..., : mix.shape[-1]]  # trim (even kernel adds one sample)
        return 0.5 * jnp.sqrt(jnp.clip(win, 1e-4)).astype(mix.dtype)

    def sde(self, x: Array, t: Array, cond: Array) -> Tuple[Array, Array]:
        _, Pn = mix_mats(self.ndim, x.dtype)
        drift = -self.d_lambda * (Pn @ x)
        sigma_mix = self._std_sigma_mix(cond)
        sigma_mix = jnp.broadcast_to(
            sigma_mix, (sigma_mix.shape[0], self.ndim, sigma_mix.shape[-1])
        )
        sigma = self.sigma_min * self.ratiosig**t
        diffusion = (
            sigma[:, None, None] * math.sqrt(2.0 * self.logsig) * sigma_mix
        )
        return drift, diffusion

    def _cov_eigval(self, t: Array) -> Tuple[Array, Array]:
        mult = self.sigma_min**2
        s_ratio_power = self.ratiosig ** (2.0 * t)
        ev1 = mult * (s_ratio_power - 1.0)
        denom = 1.0 + self.d_lambda / self.logsig
        ev2 = mult * (s_ratio_power - jnp.exp(-2.0 * self.d_lambda * t)) / denom
        return ev1, ev2

    def _var(self, t: Array) -> Array:
        ev1, ev2 = self._cov_eigval(t)
        return 0.5 * (ev1 + ev2)

    def _std(self, t: Array, mix: Array) -> Array:
        """L: (batch, n, n, samples) = (sqrt(ev1) A + sqrt(ev2) Pn) * env."""
        sigma_mix = self._std_sigma_mix(mix)
        A, Pn = mix_mats(self.ndim)
        ev1, ev2 = self._cov_eigval(t)
        L = (
            jnp.sqrt(ev1)[:, None, None, None] * A[..., None]
            + jnp.sqrt(ev2)[:, None, None, None] * Pn[..., None]
        )
        return L * sigma_mix[:, None, :, :]

    def marginal_prob(self, x0: Array, t: Array, cond: Array) -> Tuple[Array, Array]:
        A, Pn = mix_mats(self.ndim, x0.dtype)
        decay = jnp.exp(-t[:, None, None] * self.d_lambda)
        mean = (A + decay * Pn) @ x0
        return mean, self._std(t, cond)

    @staticmethod
    def mult_std(L: Array, x: Array) -> Array:
        return jnp.einsum("bcdt,bdt->bct", L, x)

    @staticmethod
    def mult_std_inv(L: Array, x: Array) -> Array:
        ndim = x.shape[1]
        if ndim == 2:
            # closed-form per-sample 2x2 solve (sdes.py:544-557)
            a, b = L[:, 0, 0, :], L[:, 0, 1, :]
            c, d = L[:, 1, 0, :], L[:, 1, 1, :]
            x1, x2 = x[:, 0, :], x[:, 1, :]
            div = 1.0 / (a * d - c * b)
            y1 = div * (d * x1 - b * x2)
            y2 = div * (a * x2 - c * x1)
            return jnp.stack((y1, y2), axis=1)
        if ndim > 2:
            Lp = jnp.moveaxis(L, -1, 1)  # (b, t, n, n)
            xp = jnp.moveaxis(x, -1, 1)[..., None]  # (b, t, n, 1)
            sol = jnp.linalg.solve(Lp, xp)[..., 0]
            return jnp.moveaxis(sol, 1, -1)
        raise ValueError(f"ndim={ndim}, it should be >= 2")

    # --- closed-form operators for exponential/DDIM-style integrators ---
    # the per-sample power envelope is time-independent, so it cancels in
    # L(t') L(t)^{-1}; the mean operators are identical to MixSDE's
    def mean_mat_inv(self, t: Array) -> Array:
        A, Pn = mix_mats(self.ndim)
        grow = jnp.exp(t[:, None, None] * self.d_lambda)
        return A + grow * Pn

    def apply_mean_inv(self, t: Array, x: Array) -> Array:
        return self.mean_mat_inv(t) @ x

    def apply_mean(self, t: Array, x: Array) -> Array:
        A, Pn = mix_mats(self.ndim, x.dtype)
        decay = jnp.exp(-t[:, None, None] * self.d_lambda)
        return (A + decay * Pn) @ x

    def apply_std_ratio(self, t_next: Array, t: Array, x: Array) -> Array:
        A, Pn = mix_mats(self.ndim)
        ev1, ev2 = self._cov_eigval(t)
        ev1n, ev2n = self._cov_eigval(t_next)
        r1 = jnp.sqrt(ev1n / ev1)[:, None, None]
        r2 = jnp.sqrt(ev2n / ev2)[:, None, None]
        return (r1 * A + r2 * Pn) @ x

    def prior_sampling(self, key: jax.Array, cond: Array) -> Array:
        b, c, n_samples = cond.shape
        t = jnp.full((b,), self.T, cond.dtype)
        std = self._std(t, cond)
        if c == self.ndim:
            mean = cond
        elif c == 1:
            mean = jnp.broadcast_to(cond / self.ndim, (b, self.ndim, n_samples))
        else:
            raise ValueError(
                "prior_sampling input must have 1 channel or ndim channels, "
                f"got {c}"
            )
        z = jax.random.normal(key, mean.shape, mean.dtype)
        return mean + self.mult_std(std, z)

    def prior_logp(self, z: Array) -> Array:
        raise NotImplementedError("prior_logp for the mixing SDE is not implemented")

    def sample_time_varprop(self, key: jax.Array, n: int, t_eps: float = 0.0) -> Array:
        return _inv_cdf_times(
            key, n, t_eps, self.T, lambda t: jnp.sqrt(self._var(t))
        )
