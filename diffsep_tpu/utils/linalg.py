"""Linear-algebra helpers.

Capability parity with utils/linalg.py:20-36 (`solve_psd_loaded`): solve a
positive semi-definite system with diagonal loading and Jacobi (diagonal)
preconditioning for numerical robustness.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def solve_psd_loaded(A: Array, b: Array, load: float = 1e-5) -> Array:
    """Solve (A + load * diag_scale * I) x = b for PSD A.

    A: (..., n, n); b: (..., n) or (..., n, k).
    The loading is scaled by the mean diagonal magnitude so `load` acts as a
    relative regularizer (mirrors the reference's intent).
    """
    n = A.shape[-1]
    diag_mean = jnp.trace(A, axis1=-2, axis2=-1) / n
    eye = jnp.eye(n, dtype=A.dtype)
    loaded = A + (load * diag_mean)[..., None, None] * eye

    # Jacobi preconditioning: scale rows/cols by 1/sqrt(diag)
    d = jnp.sqrt(jnp.clip(jnp.diagonal(loaded, axis1=-2, axis2=-1), 1e-30))
    P = loaded / d[..., :, None] / d[..., None, :]
    squeeze = b.ndim == A.ndim - 1
    if squeeze:
        b = b[..., None]
    y = jnp.linalg.solve(P, b / d[..., :, None])
    x = y / d[..., :, None]
    return x[..., 0] if squeeze else x
