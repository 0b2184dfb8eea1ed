"""Parameter/pytree helpers.

Capability parity with utils/torch_utils.py:4-29 (`count_parameters`,
`to_device`) for pytrees of arrays.
"""
from __future__ import annotations

import jax
import numpy as np


def count_parameters(params, trainable_only: bool = True) -> int:
    """Total number of scalar parameters in a pytree."""
    return int(
        sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(params))
    )


def to_device(tree, device=None, sharding=None):
    """Move a pytree of arrays to a device or sharding."""
    target = sharding if sharding is not None else device
    if target is None:
        target = jax.devices()[0]
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, target), tree)
