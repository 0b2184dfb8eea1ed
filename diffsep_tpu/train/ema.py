"""Exponential moving average of parameters.

Capability parity with the reference's use of
`torch_ema.ExponentialMovingAverage(decay=0.999)` (pl_model.py:140-143,
611-614, 650-670): the EMA is updated after every optimizer step with the
num_updates bias correction decay_t = min(decay, (1 + n) / (10 + n)), and
evaluation swaps the EMA weights in.

Functional design: the EMA is a pytree + counter carried in the train
state; `swap` returns the EMA params for evaluation (no in-place
store/restore machinery needed since params are immutable).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    params: Any  # shadow pytree
    num_updates: jnp.ndarray  # int32 scalar


def init(params) -> EMAState:
    # copy (not alias) so params and shadow stay distinct buffers — aliased
    # buffers break donation in the jitted train step
    return EMAState(
        params=jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), params
        ),
        num_updates=jnp.zeros((), jnp.int32),
    )


def update(state: EMAState, new_params, decay: float = 0.999) -> EMAState:
    n = state.num_updates + 1
    decay_t = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    one_minus = 1.0 - decay_t
    shadow = jax.tree_util.tree_map(
        lambda s, p: s - one_minus * (s - p), state.params, new_params
    )
    return EMAState(params=shadow, num_updates=n)
