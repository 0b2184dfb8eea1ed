"""Gradient clipping: fixed max-norm and AutoClip (percentile-of-history).

Capability parity with utils/autoclip_module.py:7-70 (grad_norm,
FixedClipper, AutoClipper). The reference's AutoClipper keeps an unbounded
sorted Python list on the host; here the history is a fixed-size on-device
ring buffer so the whole train step stays inside one jit — the percentile
is exact once the buffer is warm and over the filled prefix before that.

All clippers are functional: clip(grads, state) -> (grads, state, info)
where info = (grad_norm, clip_threshold) mirroring the reference's logging
contract (pl_model.py:616-639).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def grad_norm(grads) -> Array:
    """Global L2 norm over a gradient pytree (autoclip_module.py:7-17)."""
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))


def _scale(grads, norm: Array, max_norm: Array):
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return jax.tree_util.tree_map(lambda g: g * scale, grads)


class FixedClipper:
    """Clip to a fixed global norm (autoclip_module.py:20-31)."""

    def __init__(self, max_norm: float):
        self.max_norm = max_norm

    def init(self):
        return ()

    def __call__(self, grads, state=()) -> Tuple[Any, Any, Tuple[Array, Array]]:
        norm = grad_norm(grads)
        grads = _scale(grads, norm, jnp.asarray(self.max_norm))
        return grads, state, (norm, jnp.asarray(self.max_norm, jnp.float32))


class AutoClipState(NamedTuple):
    history: Array  # (capacity,) float32 ring buffer
    count: Array  # int32 number of valid entries


class AutoClipper:
    """Percentile-of-gradient-history clipping (autoclip_module.py:34-70)."""

    def __init__(self, p: float, capacity: int = 10000):
        self.p = p
        self.capacity = capacity

    def init(self) -> AutoClipState:
        return AutoClipState(
            history=jnp.zeros((self.capacity,), jnp.float32),
            count=jnp.zeros((), jnp.int32),
        )

    def __call__(self, grads, state: AutoClipState):
        norm = grad_norm(grads)
        idx = state.count % self.capacity
        history = state.history.at[idx].set(norm)
        count = state.count + 1
        n_valid = jnp.minimum(count, self.capacity)

        # percentile over the valid prefix: sort with invalid slots pushed
        # to +inf, then index at floor(p * n) like the reference
        valid = jnp.arange(self.capacity) < n_valid
        vals = jnp.where(valid, history, jnp.inf)
        vals = jnp.sort(vals)
        index = jnp.minimum(
            (self.p / 100.0 * n_valid).astype(jnp.int32), n_valid - 1
        )
        thresh = vals[index]

        grads = _scale(grads, norm, thresh)
        return grads, AutoClipState(history, count), (norm, thresh)
