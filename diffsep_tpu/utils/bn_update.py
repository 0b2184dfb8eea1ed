"""SWA-style batch-norm statistics recomputation.

Capability parity with utils/bn_update.py:36-84: one pass over a loader to
re-estimate BatchNorm running statistics (used after stochastic weight
averaging). Flax models keep BN stats in the `batch_stats` collection, so
the functional equivalent accumulates exact dataset statistics and returns
an updated variables dict. Models without a `batch_stats` collection are
returned unchanged (the reference's `_check_bn` early-out).
"""
from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp


def bn_update(
    loader: Iterable,
    apply_fn: Callable,
    variables: dict,
    batch_arg: Callable = lambda b: b[0] if isinstance(b, (list, tuple)) else b,
):
    """Recompute `batch_stats` by streaming the loader through the model.

    Args:
        loader: yields batches (tensor or tuple whose first item is the
            input, like the reference).
        apply_fn: apply_fn(variables, x, mutable=["batch_stats"]) -> (out,
            {"batch_stats": ...}) — a flax module applied in train mode.
        variables: current {"params": ..., "batch_stats": ...}.
    Returns:
        variables with `batch_stats` replaced by dataset-exact statistics.
    """
    if "batch_stats" not in variables:
        return variables

    # accumulate dataset-weighted mean of per-batch statistics, matching
    # the reference's running momentum = b / (n + b) scheme which converges
    # to the plain average over batches weighted by batch size
    totals = None
    n = 0
    for batch in loader:
        x = jnp.asarray(batch_arg(batch))
        b = x.shape[0]
        _, updated = apply_fn(variables, x, mutable=["batch_stats"])
        stats = updated["batch_stats"]
        if totals is None:
            totals = jax.tree_util.tree_map(lambda s: s * b, stats)
        else:
            totals = jax.tree_util.tree_map(
                lambda t, s: t + s * b, totals, stats
            )
        n += b
    if totals is None:
        return variables
    new_stats = jax.tree_util.tree_map(lambda t: t / n, totals)
    out = dict(variables)
    out["batch_stats"] = new_stats
    return out
