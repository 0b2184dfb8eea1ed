"""Small model helpers.

Capability parity with models/utils.py:4-16 (`get_activation` table).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def get_activation(name: str):
    table = {
        "hardtanh": lambda x: jnp.clip(x, -1.0, 1.0),
        "tanh": jnp.tanh,
        "relu": jax.nn.relu,
        "selu": jax.nn.selu,
        "swish": jax.nn.silu,
    }
    try:
        return table[name]
    except KeyError:
        raise ValueError(f"Unknown activation '{name}'") from None
