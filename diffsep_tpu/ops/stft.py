"""STFT / iSTFT with torchaudio-compatible semantics, built for TPU.

Capability parity with the reference's use of
``torchaudio.transforms.Spectrogram(power=None, n_fft=510, hop_length=128,
center=True, pad_mode="constant")`` and ``InverseSpectrogram`` (reference
models/score_models.py:29-30, config/model/default.yaml:18-24).

TPU-first design decisions
--------------------------
* The DFT is computed as a **matmul** against a precomputed (n_fft, n_bins)
  basis instead of an FFT: n_fft = 510 = 2*3*5*17 is not a power of two, so
  XLA's TPU FFT path is slow, while a 510x512 matmul maps directly onto the
  MXU and fuses with the windowing.
* Framing and overlap-add are expressed as reshapes + shifted adds over a
  (frames, hop) view — no gathers or scatters, so XLA lowers them to cheap
  layout ops.

All functions are pure and jit-friendly (static shapes only).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["STFT", "stft", "istft", "hann_window"]


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window, identical to ``torch.hann_window(periodic=True)``."""
    n = np.arange(win_length)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(dtype)


@functools.lru_cache(maxsize=None)
def _dft_basis(n_fft: int):
    """Forward rDFT basis: (n_fft, n_bins) cos and -sin matrices.

    X[f] = sum_n x[n] * exp(-2j*pi*f*n/N), onesided, unnormalized
    (torch.stft convention).
    """
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    f = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * f * n / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _idft_basis(n_fft: int):
    """Inverse rDFT basis: (n_bins, n_fft) matrices for real/imag parts.

    x[n] = (1/N) * sum_f c_f * (Re X[f] cos(2pi f n/N) - Im X[f] sin(2pi f n/N))
    with c_f = 2 for interior bins and 1 for DC / Nyquist.
    """
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft)[None, :]
    f = np.arange(n_bins)[:, None]
    ang = 2.0 * np.pi * f * n / n_fft
    c = np.full((n_bins, 1), 2.0)
    c[0] = 1.0
    if n_fft % 2 == 0:
        c[-1] = 1.0
    re_mat = (c * np.cos(ang) / n_fft).astype(np.float32)
    im_mat = (-c * np.sin(ang) / n_fft).astype(np.float32)
    return re_mat, im_mat


def _frame(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Extract overlapping frames: out[..., k, n] = x[..., k*hop + n].

    Implemented as a (num_hops, hop) reshape + C shifted static slices, which
    XLA turns into pure layout ops (no gather).
    """
    *batch, length = x.shape
    n_chunks = -(-n_fft // hop)  # ceil
    n_frames = (length - n_fft) // hop + 1
    # pad so the chunk view covers the last frame
    m = n_frames - 1 + n_chunks  # number of hop-chunks needed
    pad = m * hop - length
    if pad > 0:
        x = jnp.pad(x, [(0, 0)] * len(batch) + [(0, pad)])
    chunks = x[..., : m * hop].reshape(*batch, m, hop)
    views = [chunks[..., j : j + n_frames, :] for j in range(n_chunks)]
    frames = jnp.concatenate(views, axis=-1)  # (..., n_frames, n_chunks*hop)
    return frames[..., :n_fft]


def _overlap_add(frames: jax.Array, hop: int, out_len: int) -> jax.Array:
    """Inverse of `_frame`: y[..., k*hop + n] += frames[..., k, n]."""
    *batch, n_frames, n_fft = frames.shape
    n_chunks = -(-n_fft // hop)
    pad = n_chunks * hop - n_fft
    if pad > 0:
        frames = jnp.pad(frames, [(0, 0)] * (len(batch) + 1) + [(0, pad)])
    chunks = frames.reshape(*batch, n_frames, n_chunks, hop)
    total = (n_frames - 1 + n_chunks) * hop
    y = jnp.zeros((*batch, n_frames - 1 + n_chunks, hop), frames.dtype)
    for j in range(n_chunks):
        y = y.at[..., j : j + n_frames, :].add(chunks[..., :, j, :])
    y = y.reshape(*batch, total)
    if total < out_len:
        y = jnp.pad(y, [(0, 0)] * len(batch) + [(0, out_len - total)])
    return y[..., :out_len]


def stft(
    x: jax.Array,
    n_fft: int = 510,
    hop_length: int = 128,
    window: jax.Array | None = None,
    center: bool = True,
    dtype=jnp.complex64,
) -> jax.Array:
    """Complex STFT with torch.stft semantics (onesided, unnormalized).

    Args:
        x: real signal (..., time)
        window: (n_fft,) analysis window; periodic Hann by default.
    Returns:
        complex spectrogram (..., n_bins, n_frames), n_bins = n_fft//2 + 1.
    """
    if window is None:
        window = jnp.asarray(hann_window(n_fft))
    if center:
        p = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(p, p)])
    frames = _frame(x, n_fft, hop_length) * window  # (..., K, n_fft)
    cos_m, msin_m = _dft_basis(n_fft)
    re = frames @ jnp.asarray(cos_m)
    im = frames @ jnp.asarray(msin_m)
    spec = jax.lax.complex(re, im).astype(dtype)
    return jnp.swapaxes(spec, -1, -2)  # (..., n_bins, K)


def istft(
    spec: jax.Array,
    n_fft: int = 510,
    hop_length: int = 128,
    window: jax.Array | None = None,
    center: bool = True,
    length: int | None = None,
    eps: float = 1e-11,
) -> jax.Array:
    """Inverse STFT with torch.istft semantics (window-envelope normalized).

    Args:
        spec: complex spectrogram (..., n_bins, n_frames)
    Returns:
        real signal (..., length) — defaults to (n_frames - 1) * hop_length
        when `center` (torch.istft's default output length).
    """
    if window is None:
        window = jnp.asarray(hann_window(n_fft))
    spec = jnp.swapaxes(spec, -1, -2)  # (..., K, n_bins)
    n_frames = spec.shape[-2]
    re_mat, im_mat = _idft_basis(n_fft)
    frames = jnp.real(spec) @ jnp.asarray(re_mat) + jnp.imag(spec) @ jnp.asarray(
        im_mat
    )  # (..., K, n_fft)
    frames = frames * window

    total = (n_frames - 1) * hop_length + n_fft
    y = _overlap_add(frames, hop_length, total)

    # window-envelope normalization (sum of squared windows, overlap-added)
    wsq = jnp.broadcast_to(window * window, (n_frames, n_fft))
    env = _overlap_add(wsq, hop_length, total)
    y = y / jnp.maximum(env, eps)

    if center:
        p = n_fft // 2
        y = y[..., p : total - p]
    if length is not None:
        cur = y.shape[-1]
        if cur < length:
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, length - cur)])
        else:
            y = y[..., :length]
    elif center:
        y = y[..., : (n_frames - 1) * hop_length]
    return y


class STFT:
    """Bundled forward/inverse transform with fixed parameters.

    Mirrors the role of the `Spectrogram`/`InverseSpectrogram` module pair in
    the reference (models/score_models.py:29-30) as a stateless callable.
    """

    def __init__(self, n_fft: int = 510, hop_length: int = 128, center: bool = True):
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.center = center
        self.n_bins = n_fft // 2 + 1
        self.window = jnp.asarray(hann_window(n_fft))

    def __call__(self, x: jax.Array) -> jax.Array:
        return stft(x, self.n_fft, self.hop_length, self.window, self.center)

    def inverse(self, spec: jax.Array, length: int | None = None) -> jax.Array:
        return istft(spec, self.n_fft, self.hop_length, self.window, self.center, length)

    def num_frames(self, n_samples: int) -> int:
        """Frame count for an input of `n_samples` (center=True)."""
        if self.center:
            return 1 + n_samples // self.hop_length
        return 1 + (n_samples - self.n_fft) // self.hop_length
