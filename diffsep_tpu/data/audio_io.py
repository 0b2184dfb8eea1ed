"""WAV I/O without torchaudio.

torchaudio.load semantics (used throughout the reference data layer and
CLIs): returns float32 in [-1, 1], shape (channels, samples). Implemented
on scipy.io.wavfile with integer-PCM normalization; a C++ fast loader can
be slotted in via `set_backend` (native/ directory) for bulk evaluation.
"""
from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np

_backend = "scipy"


def set_backend(name: str):
    global _backend
    _backend = name


def load_wav(path) -> Tuple[np.ndarray, int]:
    """Read a wav file -> (float32 (channels, samples) in [-1, 1], fs)."""
    if _backend == "native":
        from . import native_io

        return native_io.load_wav(str(path))
    from scipy.io import wavfile

    return _normalize_decoded(*wavfile.read(str(path)))


def load_wav_bytes(data: bytes) -> Tuple[np.ndarray, int]:
    """Decode in-memory wav bytes (e.g. an HTTP request body) ->
    (float32 (channels, samples) in [-1, 1], fs)."""
    import io

    from scipy.io import wavfile

    return _normalize_decoded(*wavfile.read(io.BytesIO(data)))


def _normalize_decoded(fs: int, data: np.ndarray) -> Tuple[np.ndarray, int]:
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 1:
        data = data[None, :]
    else:
        data = data.T
    return np.ascontiguousarray(data), int(fs)


def _encode_pcm(data: np.ndarray, dtype: str) -> np.ndarray:
    data = np.asarray(data)
    if data.ndim == 2:
        data = data.T  # scipy expects (samples, channels)
    if data.ndim == 2 and data.shape[1] == 1:
        data = data[:, 0]
    if dtype == "int16":
        data = np.clip(data, -1.0, 1.0)
        data = (data * 32767.0).astype(np.int16)
    else:
        data = data.astype(np.float32)
    return data


def save_wav(path, data: np.ndarray, fs: int, dtype: str = "int16"):
    """Write (channels, samples) float data to a wav file."""
    from scipy.io import wavfile

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    wavfile.write(str(path), fs, _encode_pcm(data, dtype))


def wav_to_bytes(data: np.ndarray, fs: int, dtype: str = "int16") -> bytes:
    """Encode (channels, samples) float data to in-memory wav bytes (e.g.
    an HTTP response body). Multi-source estimates become one multi-channel
    wav: channel i = source i."""
    import io

    from scipy.io import wavfile

    buf = io.BytesIO()
    wavfile.write(buf, fs, _encode_pcm(data, dtype))
    return buf.getvalue()
