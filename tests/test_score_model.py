"""ScoreModelNCSNpp frontend tests.

The torch reference wrapper (models/score_models.py) cannot run here
(torchaudio is unavailable), but its frontend semantics are fully specified:
STFT pre-pad, exponent compression, real/imag stacking, pad-to-64-frames.
These tests check the transform inverses, the frame-padding contract, and
end-to-end shape/grad sanity of the wrapper.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsep_tpu.models import NCSNpp, ScoreModelNCSNpp


def tiny_score_model(num_sources=2):
    backbone = NCSNpp(
        nf=8,
        ch_mult=(1, 2),
        num_res_blocks=1,
        attn_resolutions=(128,),
        image_size=256,
        num_channels_in=2 * num_sources + 2,
        num_channels_out=2 * num_sources,
    )
    return ScoreModelNCSNpp(
        backbone=backbone,
        num_sources=num_sources,
        spec_factor=0.15,
        spec_abs_exponent=0.5,
    )


def test_transform_inverse(rng):
    model = tiny_score_model()
    spec = jnp.asarray(
        (rng.standard_normal((1, 2, 8, 8)) + 1j * rng.standard_normal((1, 2, 8, 8))).astype(
            np.complex64
        )
    )
    # bind parameterless methods via init/apply on a dummy input
    fwd = model.transform_forward(spec)
    back = model.transform_backward(fwd)
    np.testing.assert_allclose(np.asarray(back), np.asarray(spec), atol=1e-5)


def test_transform_exponent_semantics(rng):
    """|fwd| = |x|^e * factor and phase is preserved (score_models.py:41-57)."""
    model = tiny_score_model()
    x = jnp.asarray((0.5 - 0.3j) * np.ones((1, 1, 2, 2), np.complex64))
    y = np.asarray(model.transform_forward(x))
    mag = np.abs(0.5 - 0.3j)
    np.testing.assert_allclose(np.abs(y), mag**0.5 * 0.15, rtol=1e-5)
    np.testing.assert_allclose(np.angle(y), np.angle(0.5 - 0.3j), rtol=1e-5)


def test_pre_post_round_trip(rng):
    """pre_process -> post_process is the identity on the signal
    (pad + STFT + compression are all exactly invertible)."""
    model = tiny_score_model()
    x = jnp.asarray(rng.standard_normal((1, 2, 5000)).astype(np.float32))
    h, n_samples, n_pad = model.pre_process(x)
    assert h.shape[-2] % 64 == 0 and h.shape[-3] == 256 and h.shape[-1] == 4
    y = model.post_process(h, n_samples, n_pad)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


def test_forward_shape_and_grad(rng):
    model = tiny_score_model()
    xt = jnp.asarray(rng.standard_normal((1, 2, 2000)).astype(np.float32))
    mix = xt.sum(axis=1, keepdims=True)
    t = jnp.full((1,), 0.7)
    params = model.init(jax.random.PRNGKey(0), xt, t, mix)
    score = model.apply(params, xt, t, mix)
    assert score.shape == xt.shape

    def loss(p):
        return (model.apply(p, xt, t, mix) ** 2).mean()

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # at least one conv kernel receives nonzero gradient
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
