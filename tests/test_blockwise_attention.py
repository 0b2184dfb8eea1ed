"""Blockwise online-softmax attention (models/layers.py:blockwise_attention).

The (HW, HW) score matrix of the naive attention is what makes long
utterances quadratic in memory (the time-frames axis grows with signal
length; the round-3 sequence-parallel probe measured the resulting peak —
ROADMAP "Sequence-parallel inference").  The blockwise path must be
numerically EXACT (up to per-tile rescaling reassociation) and engage
automatically past the token threshold without touching the short-signal
program.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsep_tpu.models.layers import (
    ATTN_BLOCKWISE_THRESHOLD,
    AttnBlockpp,
    blockwise_attention,
)


def _naive(q, k, v, scale):
    w = jnp.einsum(
        "bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    w = jax.nn.softmax(w, axis=-1).astype(q.dtype)
    return jnp.einsum(
        "bqk,bkc->bqc", w, v, preferred_element_type=jnp.float32
    )


@pytest.mark.parametrize(
    "n,q_block,k_block",
    [
        (64, 64, 64),     # single tile: degenerates to naive
        (137, 32, 32),    # ragged: both axes padded + masked
        (256, 64, 32),    # unequal tiles
        (33, 64, 64),     # n smaller than one tile
    ],
)
def test_blockwise_equals_naive_f32(rng, n, q_block, k_block):
    b, c = 2, 24
    q = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    scale = c ** -0.5
    ref = np.asarray(_naive(q, k, v, scale))
    out = np.asarray(
        blockwise_attention(q, k, v, scale, q_block=q_block, k_block=k_block)
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-6, rtol=2e-6)


def test_blockwise_equals_naive_bf16(rng):
    """bf16 inputs follow the naive path's convention (probability tile cast
    to v.dtype before the MXU matmul, f32 accumulation)."""
    b, n, c = 1, 200, 16
    q = jnp.asarray(rng.standard_normal((b, n, c)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, n, c)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, n, c)), jnp.bfloat16)
    scale = c ** -0.5
    ref = np.asarray(_naive(q, k, v, scale), np.float32)
    out = np.asarray(
        blockwise_attention(q, k, v, scale, q_block=64, k_block=64),
        np.float32,
    )
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_sharp_rows_no_overflow(rng):
    """Large logits (sharp softmax) must not overflow: the online max
    subtraction is what makes this safe."""
    b, n, c = 1, 96, 8
    q = jnp.asarray(rng.standard_normal((b, n, c)) * 40.0, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, c)) * 40.0, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    out = np.asarray(blockwise_attention(q, k, v, 1.0, 32, 32))
    ref = np.asarray(_naive(q, k, v, 1.0))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_attnblock_env_forced_parity(rng, monkeypatch):
    """The module output is identical (tight f32 tolerance) whether the
    blockwise or naive path runs, on the same initialized params."""
    x = jnp.asarray(rng.standard_normal((2, 8, 40, 16)), jnp.float32)
    blk = AttnBlockpp(skip_rescale=True, init_scale=0.1)
    params = blk.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("DIFFSEP_ATTN_BLOCKWISE", "0")
    ref = np.asarray(blk.apply(params, x))
    monkeypatch.setenv("DIFFSEP_ATTN_BLOCKWISE", "1")
    out = np.asarray(blk.apply(params, x))
    np.testing.assert_allclose(out, ref, atol=2e-6, rtol=2e-6)


def test_auto_threshold(monkeypatch):
    from diffsep_tpu.models.layers import _attn_blockwise

    monkeypatch.delenv("DIFFSEP_ATTN_BLOCKWISE", raising=False)
    assert not _attn_blockwise(ATTN_BLOCKWISE_THRESHOLD)
    assert _attn_blockwise(ATTN_BLOCKWISE_THRESHOLD + 1)
    monkeypatch.setenv("DIFFSEP_ATTN_BLOCKWISE", "1")
    assert _attn_blockwise(1)
    monkeypatch.setenv("DIFFSEP_ATTN_BLOCKWISE", "0")
    assert not _attn_blockwise(10**9)


def test_score_model_long_signal_blockwise(rng, monkeypatch):
    """End-to-end through the tiny score model: a signal long enough that
    the attention level crosses the threshold produces the same score with
    blockwise forced on and off."""
    from diffsep_tpu.config import compose
    from diffsep_tpu.model import DiffSepModel

    cfg = compose(
        [
            "model.score_model.backbone_args.nf=8",
            "model.score_model.backbone_args.ch_mult=[1,2]",
            "model.score_model.backbone_args.num_res_blocks=1",
            "model.score_model.backbone_args.attn_resolutions=[16]",
            "model.score_model.stft_args.n_fft=126",
            "model.score_model.stft_args.hop_length=32",
        ]
    )
    model = DiffSepModel(cfg)
    n = 4000
    mix = jnp.asarray(rng.standard_normal((1, 1, n)), jnp.float32) * 0.1
    tgt = jnp.zeros((1, 2, n), jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0), mix, tgt)
    xt = jnp.asarray(rng.standard_normal((1, 2, n)), jnp.float32) * 0.1
    t = jnp.asarray([0.5], jnp.float32)

    monkeypatch.setenv("DIFFSEP_ATTN_BLOCKWISE", "0")
    ref = np.asarray(model.score_apply(params, xt, t, mix))
    monkeypatch.setenv("DIFFSEP_ATTN_BLOCKWISE", "1")
    out = np.asarray(model.score_apply(params, xt, t, mix))
    scale = max(np.abs(ref).max(), 1e-3)
    np.testing.assert_allclose(out, ref, atol=1e-5 * scale, rtol=1e-5)
