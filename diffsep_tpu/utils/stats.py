"""Running mean/variance tracker (Welford-style).

Capability parity with utils/stats.py:4-58 (`StandardScaler`, an nn.Module
with running-stat buffers). Functional JAX redesign: the statistics are an
explicit pytree state so they can live inside a jitted train step and be
checkpointed with everything else.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


class ScalerState(NamedTuple):
    count: Array  # scalar
    mean: Array
    m2: Array  # sum of squared deviations


class StandardScaler:
    """Accumulate mean/std over selected axes and scale inputs.

    dims: axes reduced when accumulating (default: all but the last).
    """

    def __init__(self, feature_shape: Sequence[int], dims=None, eps: float = 1e-7):
        self.feature_shape = tuple(feature_shape)
        self.dims = dims
        self.eps = eps

    def init(self) -> ScalerState:
        z = jnp.zeros(self.feature_shape, jnp.float32)
        return ScalerState(count=jnp.zeros((), jnp.float32), mean=z, m2=z)

    def update(self, state: ScalerState, x: Array) -> ScalerState:
        dims = self.dims
        if dims is None:
            dims = tuple(range(x.ndim - len(self.feature_shape)))
        n_b = jnp.prod(jnp.asarray([x.shape[d] for d in dims], jnp.float32))
        mean_b = x.mean(axis=dims)
        m2_b = ((x - jnp.expand_dims(mean_b, dims)) ** 2).sum(axis=dims)

        # Chan et al. parallel combination of (count, mean, M2)
        n = state.count + n_b
        delta = mean_b - state.mean
        mean = state.mean + delta * (n_b / jnp.maximum(n, 1.0))
        m2 = state.m2 + m2_b + delta**2 * state.count * n_b / jnp.maximum(n, 1.0)
        return ScalerState(count=n, mean=mean, m2=m2)

    def std(self, state: ScalerState) -> Array:
        var = state.m2 / jnp.maximum(state.count - 1.0, 1.0)
        return jnp.sqrt(jnp.maximum(var, 0.0)) + self.eps

    def scale(self, state: ScalerState, x: Array) -> Array:
        return (x - state.mean) / self.std(state)

    def unscale(self, state: ScalerState, x: Array) -> Array:
        return x * self.std(state) + state.mean
