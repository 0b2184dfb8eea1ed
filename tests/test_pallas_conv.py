"""Pallas conv3x3 kernel vs the XLA oracle (interpret mode on CPU).

The same oracle discipline the reference uses for its CUDA kernels
(upfirdn2d_native as the semantics-defining fallback, op/upfirdn2d.py:159).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsep_tpu.ops.pallas.conv3x3 import (
    _conv3x3_pallas,
    conv3x3_mxu,
    conv3x3_reference,
)


@pytest.mark.parametrize(
    "shape",
    [
        (2, 8, 10, 8, 16),  # tiny
        (1, 16, 20, 128, 64),  # lane-aligned channels
        (2, 4, 6, 3, 5),  # nothing aligned
        (1, 5, 7, 4, 4),  # odd H forces tile_h=1
        (1, 8, 30, 8, 8),  # w+2 already a multiple of 8
    ],
)
def test_forward_matches_oracle(shape):
    b, h, w, ci, co = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, ci)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, ci, co)), jnp.float32) * 0.1
    got = _conv3x3_pallas(x, k, interpret=True)
    want = conv3x3_reference(x, k)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
    )


def test_gradients_match_oracle():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 10, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 16)), jnp.float32) * 0.1
    f_ref = lambda x, k: jnp.sum(jnp.sin(conv3x3_reference(x, k)))
    f_mxu = lambda x, k: jnp.sum(jnp.sin(conv3x3_mxu(x, k)))
    gx_r, gk_r = jax.grad(f_ref, argnums=(0, 1))(x, k)
    gx_m, gk_m = jax.grad(f_mxu, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_m), np.asarray(gx_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk_m), np.asarray(gk_r), atol=1e-4)


def test_edge_pixels_zero_padded():
    """SAME semantics at the borders: a kernel of ones on an input of ones
    counts the 3x3 neighbourhood inside the image."""
    x = jnp.ones((1, 4, 5, 1), jnp.float32)
    k = jnp.ones((3, 3, 1, 1), jnp.float32)
    out = np.asarray(_conv3x3_pallas(x, k, interpret=True))[0, :, :, 0]
    assert out[0, 0] == 4.0  # corner: 2x2 neighbourhood
    assert out[0, 2] == 6.0  # top edge: 2x3
    assert out[2, 2] == 9.0  # interior: 3x3
