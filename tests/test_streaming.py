"""Streaming long-form separation (diffsep_tpu/streaming.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsep_tpu.streaming import _best_perm, separate_streaming


class _MockConfig:
    class model:
        fs = 8000


class _MockModel:
    """get_pc_sampler contract; emits [y, -y] with a per-call source flip
    to simulate the per-chunk permutation ambiguity of diffusion
    separation."""

    config = _MockConfig()

    def __init__(self):
        self.calls = 0

    def get_pc_sampler(self, predictor, corrector, y, params, key=None, **kw):
        self.calls += 1
        flip = self.calls % 2 == 0

        def sampler():
            est = jnp.stack([y[:, 0], -y[:, 0]], axis=1)
            if flip:
                est = est[:, ::-1]
            return est, 6

        return sampler


def test_best_perm_detects_swap():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((2, 100))
    assert _best_perm(a, a) == (0, 1)
    assert _best_perm(a, a[::-1]) == (1, 0)


def test_streaming_aligns_permutations_and_is_continuous():
    """Chunks come back with alternating source order; the stitcher must
    undo the swaps so each output channel is globally consistent."""
    rng = np.random.default_rng(1)
    n = 40000  # 5 s @ 8 kHz -> 4 chunks of 1.5 s with 0.25 s overlap
    mix = rng.standard_normal((1, n)).astype(np.float32) * 0.1
    model = _MockModel()
    out = separate_streaming(
        model, params=None, key=jax.random.PRNGKey(0), mix=mix,
        chunk_s=1.5, overlap_s=0.25, batch=2,
    )
    assert out.shape == (2, n)
    assert model.calls > 1  # really went through multiple batches
    # source 0 reconstructs the mixture exactly everywhere (including
    # across every seam): any un-fixed swap would break a whole chunk
    np.testing.assert_allclose(out[0], mix[0], atol=1e-5)
    # source 1 is the globally-consistent counterpart
    c = np.dot(out[1], -mix[0]) / (
        np.linalg.norm(out[1]) * np.linalg.norm(mix[0]) + 1e-9
    )
    assert c > 0.99, c


def test_streaming_short_input_single_chunk():
    mix = np.random.default_rng(2).standard_normal((1, 4000)).astype(np.float32)
    model = _MockModel()
    out = separate_streaming(
        model, None, jax.random.PRNGKey(0), mix, chunk_s=1.0, overlap_s=0.2
    )
    assert out.shape == (2, 4000)
    np.testing.assert_allclose(out[0], mix[0], atol=1e-5)


def test_streaming_rejects_stereo():
    model = _MockModel()
    with pytest.raises(ValueError):
        separate_streaming(
            model, None, jax.random.PRNGKey(0), np.zeros((2, 8000))
        )
