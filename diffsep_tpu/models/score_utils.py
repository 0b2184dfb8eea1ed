"""Score-model registry + time/label convention glue.

Capability parity with models/ncsnpp_utils/utils.py:28-182: the model
registry (`register_model` / `get_model`), SMLD sigma schedules
(`get_sigmas`), DDPM beta/alpha tables (`get_ddpm_params`), and
`get_score_fn`, which adapts a raw network to a true time-dependent score
for the OUVE/OUVP time->label conventions.  The reference's
`create_model` DataParallel wrap (utils.py:88-94) is subsumed by pjit
sharding and intentionally has no equivalent (SURVEY.md §2.8).
"""
from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp
import numpy as np

from ..sde.ouve import OUVESDE, OUVPSDE
from ..utils.registry import Registry

ModelRegistry = Registry("score model")


def register_model(cls=None, *, name: str | None = None):
    """Decorator registering a score-network class by name."""

    def _register(c):
        ModelRegistry.register(name or c.__name__)(c)
        return c

    return _register if cls is None else _register(cls)


def get_model(name: str):
    return ModelRegistry.get_by_name(name)


def get_sigmas(sigma_min: float, sigma_max: float, num_scales: int) -> np.ndarray:
    """Geometric noise-level ladder for SMLD (utils.py:51-60)."""
    return np.exp(np.linspace(np.log(sigma_max), np.log(sigma_min), num_scales))


def get_ddpm_params(beta_min: float, beta_max: float, num_scales: int) -> Dict:
    """DDPM beta/alpha tables (utils.py:63-85)."""
    num_diffusion_timesteps = 1000
    beta_start = beta_min / num_scales
    beta_end = beta_max / num_scales
    betas = np.linspace(beta_start, beta_end, num_diffusion_timesteps, dtype=np.float64)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    return {
        "betas": betas,
        "alphas": alphas,
        "alphas_cumprod": alphas_cumprod,
        "sqrt_alphas_cumprod": np.sqrt(alphas_cumprod),
        "sqrt_1m_alphas_cumprod": np.sqrt(1.0 - alphas_cumprod),
        "beta_min": beta_start * (num_diffusion_timesteps - 1),
        "beta_max": beta_end * (num_diffusion_timesteps - 1),
        "num_diffusion_timesteps": num_diffusion_timesteps,
    }


def get_score_fn(
    sde, model_fn: Callable, continuous: bool = False
) -> Callable:
    """Wrap a raw network into a real score function for OUVE/OUVP time
    conventions (utils.py:97-182). `model_fn(x, labels)` is the network."""
    if isinstance(sde, OUVPSDE):

        def score_fn(x, t, *cond):
            if continuous:
                labels = t * 999
                score = model_fn(x, labels)
                std = sde.marginal_prob(jnp.zeros_like(x), t, *cond)[1]
            else:
                labels = t * (sde.N - 1)
                score = model_fn(x, labels)
                table = jnp.asarray(
                    get_ddpm_params(sde.beta_min, sde.beta_max, sde.N)[
                        "sqrt_1m_alphas_cumprod"
                    ]
                )
                std = table[labels.astype(jnp.int32)]
            pad = (...,) + (None,) * (x.ndim - 1)
            return -score / std[pad]

        return score_fn

    if isinstance(sde, OUVESDE):

        def score_fn(x, t, *cond):
            if continuous:
                labels = sde.marginal_prob(jnp.zeros_like(x), t, *cond)[1]
            else:
                labels = jnp.round((sde.T - t) * (sde.N - 1))
            return model_fn(x, labels)

        return score_fn

    raise NotImplementedError(
        f"SDE class {type(sde).__name__} not yet supported."
    )
