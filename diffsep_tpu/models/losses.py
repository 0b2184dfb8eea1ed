"""Separation metrics / losses in pure JAX.

Capability parity with models/losses.py (SISDRLoss wrapping
fast_bss_eval.si_sdr_pit_loss, and the PESQ module).  fast_bss_eval is not
available in this environment, so SI-SDR with permutation-invariant
alignment is implemented natively (vectorized over all n! permutations —
exact for the n_src ∈ {2, 3} the datasets use).

PESQ is an ITU-T binary metric with no JAX analogue; the wrapper gates on
the optional `pesq` package exactly like the reference's CPU-side usage
(losses.py:40-56) and raises an informative error when absent.
"""
from __future__ import annotations

import itertools
import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

__all__ = ["si_sdr", "si_sdr_pit", "SISDRLoss", "PESQ"]

_EPS = 1e-8


def _pairwise_si_sdr(
    est: Array, ref: Array, zero_mean: bool, clamp_db: Optional[float]
) -> Array:
    """si_sdr[..., i, j] of est source j against ref source i.

    est, ref: (..., n_src, time).
    """
    if zero_mean:
        est = est - est.mean(axis=-1, keepdims=True)
        ref = ref - ref.mean(axis=-1, keepdims=True)
    # projection of est_j on ref_i
    dot = jnp.einsum("...it,...jt->...ij", ref, est)
    ref_pow = jnp.sum(ref**2, axis=-1)[..., :, None]  # (..., i, 1)
    scale = dot / jnp.maximum(ref_pow, _EPS)  # (..., i, j)
    # ||scale*ref_i||^2 and ||est_j - scale*ref_i||^2 expanded without
    # materializing the (i, j, t) tensor:
    target_pow = scale**2 * ref_pow
    est_pow = jnp.sum(est**2, axis=-1)[..., None, :]
    err_pow = est_pow - 2 * scale * dot + target_pow
    ratio = target_pow / jnp.maximum(err_pow, _EPS)
    sdr = 10.0 * jnp.log10(jnp.maximum(ratio, 1e-30))
    if clamp_db is not None:
        sdr = jnp.clip(sdr, -clamp_db, clamp_db)
    return sdr


def si_sdr(
    est: Array,
    ref: Array,
    zero_mean: bool = False,
    clamp_db: Optional[float] = None,
) -> Array:
    """Per-source SI-SDR without permutation search: (..., n_src)."""
    m = _pairwise_si_sdr(est, ref, zero_mean, clamp_db)
    return jnp.diagonal(m, axis1=-2, axis2=-1)


def si_sdr_pit(
    est: Array,
    ref: Array,
    zero_mean: bool = False,
    clamp_db: Optional[float] = None,
    return_perm: bool = False,
):
    """Permutation-invariant SI-SDR: best average over source alignments.

    Returns (..., n_src) SI-SDR under the best permutation (and optionally
    the permutation indices mapping ref index -> est index).
    """
    m = _pairwise_si_sdr(est, ref, zero_mean, clamp_db)  # (..., i, j)
    n = m.shape[-1]
    perms = list(itertools.permutations(range(n)))
    perm_arr = jnp.asarray(perms)  # (n!, n)
    # score of each permutation: sum_i m[i, perm[i]]
    scores = jnp.stack(
        [m[..., jnp.arange(n), jnp.asarray(p)].sum(axis=-1) for p in perms],
        axis=-1,
    )  # (..., n!)
    best = jnp.argmax(scores, axis=-1)
    best_perm = perm_arr[best]  # (..., n)
    # gather m[..., i, best_perm[..., i]]
    vals = jnp.take_along_axis(m, best_perm[..., :, None], axis=-1)[..., 0]
    if return_perm:
        return vals, best_perm
    return vals


class SISDRLoss:
    """Negative PIT SI-SDR loss (models/losses.py:8-37 semantics).

    sign_flip=True returns positive SI-SDR (used as a validation metric).
    """

    def __init__(
        self,
        zero_mean: bool = False,
        clamp_db: Optional[float] = None,
        reduction: str = "mean",
        sign_flip: bool = False,
    ):
        if reduction not in ("mean", "sum", "none"):
            raise ValueError("reduction must be one of 'none'|'mean'|'sum'")
        self.zero_mean = zero_mean
        self.clamp_db = clamp_db
        self.reduction = reduction
        self.sign_flip = sign_flip

    def __call__(self, est: Array, ref: Array) -> Array:
        vals = si_sdr_pit(est, ref, self.zero_mean, self.clamp_db)
        neg = -vals.mean(axis=-1)  # per batch entry
        if self.sign_flip:
            neg = -neg
        if self.reduction == "mean":
            return neg.mean()
        if self.reduction == "sum":
            return neg.sum()
        return neg


class PESQ:
    """ITU-T PESQ metric (reference models/losses.py:40-56): the optional
    GPL `pesq` package when installed, else the native P.862-style
    implementation (models/pesq_native.py). Computed host-side on up to
    `max_items` batch entries, matching the reference's 4-item average."""

    def __init__(self, mode: str = "wb", fs: int = 16000, max_items: int = 4):
        self.mode = mode
        self.fs = fs
        self.max_items = max_items

    def __call__(self, est, ref) -> float:
        from .pesq_native import get_pesq

        _pesq = get_pesq()
        est = np.asarray(est)
        ref = np.asarray(ref)
        if est.ndim != 3 or ref.ndim != 3:
            # indexing [i, 0] on a (batch, samples) array silently yields
            # scalars and PESQ then fails with a confusing length error
            raise ValueError(
                "PESQ expects (batch, channels, samples) arrays, got "
                f"est{est.shape} / ref{ref.shape}"
            )
        n = min(self.max_items, est.shape[0])
        vals, last_err = [], None
        for i in range(n):
            try:
                vals.append(_pesq(self.fs, ref[i, 0], est[i, 0], self.mode))
            except Exception as e:
                # one short/silent clip must not discard the whole batch's
                # metric — average the items that scored
                last_err = e
        if not vals:
            raise last_err if last_err is not None else ValueError("empty batch")
        if len(vals) < n:
            # surface partial failures: a mostly-failed batch would otherwise
            # silently report the mean of the few survivors
            logging.getLogger(__name__).warning(
                "PESQ dropped %d/%d items (last error: %s); metric is the "
                "mean of the surviving %d",
                n - len(vals), n, last_err, len(vals),
            )
        return float(np.mean(vals))
