"""STFT parity tests against torch.stft / torch.istft (CPU oracle).

The reference relies on torchaudio's Spectrogram/InverseSpectrogram
(models/score_models.py:29-30); bit-faithful STFT semantics are required for
checkpoint-parity SI-SDR (SURVEY.md §7.3 item 2).
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from diffsep_tpu.ops.stft import STFT, hann_window, istft, stft


@pytest.mark.parametrize("n_fft,hop", [(510, 128), (512, 128), (256, 64)])
def test_stft_matches_torch(rng, n_fft, hop):
    x = rng.standard_normal((2, 3 * n_fft + 57)).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(x), n_fft, hop))
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft),
        center=True,
        pad_mode="constant",
        normalized=False,
        onesided=True,
        return_complex=True,
    ).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3 * np.abs(ref).max())


@pytest.mark.parametrize("n_fft,hop", [(510, 128), (512, 128)])
def test_istft_matches_torch(rng, n_fft, hop):
    x = rng.standard_normal((2, 4 * n_fft)).astype(np.float32)
    spec = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft),
        center=True,
        pad_mode="constant",
        return_complex=True,
    )
    ref = torch.istft(
        spec, n_fft=n_fft, hop_length=hop, window=torch.hann_window(n_fft), center=True
    ).numpy()
    ours = np.asarray(istft(jnp.asarray(spec.numpy()), n_fft, hop))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_round_trip_default_params(rng):
    """The production configuration: n_fft=510, hop=128, with the reference's
    pre-pad of n_fft - hop samples (score_models.py:107-116)."""
    t = STFT()
    n = 8000
    x = rng.standard_normal((1, 2, n)).astype(np.float32)
    xp = jnp.pad(jnp.asarray(x), ((0, 0), (0, 0), (0, t.n_fft - t.hop_length)))
    spec = t(xp)
    assert spec.shape[-2] == 256  # freq bins = image height for the U-Net
    y = t.inverse(spec, length=n)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)


def test_num_frames(rng):
    t = STFT()
    for n in [1000, 8000, 40382]:
        x = jnp.zeros((1, n))
        assert t(x).shape[-1] == t.num_frames(n)
