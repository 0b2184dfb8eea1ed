"""Auxiliary model-family tests: DiffuSE, TCN, DPTNet."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsep_tpu.models.cdiffuse import DiffuSE, DiffusionEmbedding
from diffsep_tpu.models.dptnet import DPTNet
from diffsep_tpu.models.tcn import TemporalConvNet


def test_diffuse_forward(rng):
    model = DiffuSE(
        num_channels_in=2, num_channels_out=2,
        residual_layers=4, residual_channels=8,
        dilation_cycle_length=2, embedding_len=50,
    )
    x = jnp.asarray(rng.standard_normal((2, 2, 256)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((2, 1, 256)).astype(np.float32))
    t = jnp.asarray([0.3, 0.8])
    params = model.init(jax.random.PRNGKey(0), x, t, y)
    out = model.apply(params, x, t, y)
    assert out.shape == (2, 2, 256)
    assert np.isfinite(np.asarray(out)).all()
    # zero-init output projection => exactly zero at init
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_diffusion_embedding_lerp_consistency():
    """Continuous t between table rows interpolates linearly
    (cdiffuse_network.py:58-63)."""
    emb = DiffusionEmbedding(max_steps=50)
    params = emb.init(jax.random.PRNGKey(0), jnp.asarray([0.1]))
    lo = emb.apply(params, jnp.asarray([5], jnp.int32))
    mid = emb.apply(params, jnp.asarray([5.0 / 50.0]))
    np.testing.assert_allclose(np.asarray(mid), np.asarray(lo), atol=1e-5)


def test_tcn_mask_shapes(rng):
    model = TemporalConvNet(N=16, B=8, H=12, P=3, X=2, R=2, C=2)
    w = jnp.asarray(rng.standard_normal((2, 16, 40)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), w)
    mask = model.apply(params, w)
    assert mask.shape == (2, 2, 16, 40)
    assert (np.asarray(mask) >= 0).all()  # relu masks


def test_tcn_causal(rng):
    model = TemporalConvNet(N=8, B=4, H=6, P=3, X=2, R=1, C=2, causal=True,
                            norm_type="cLN")
    w = jnp.asarray(rng.standard_normal((1, 8, 32)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), w)
    assert model.apply(params, w).shape == (1, 2, 8, 32)


@pytest.mark.parametrize("rnn_type", ["LSTM", "GRU"])
def test_dptnet_forward(rng, rnn_type):
    model = DPTNet(
        rnn_type=rnn_type, input_size=8, hidden_size=12, output_size=6,
        att_heads=2, num_layers=1,
    )
    x = jnp.asarray(rng.standard_normal((1, 8, 10, 4)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 6, 10, 4)
    assert np.isfinite(np.asarray(out)).all()
