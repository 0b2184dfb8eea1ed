"""Native (C++) WAV I/O tests; skipped when the library isn't built."""
import subprocess
from pathlib import Path

import numpy as np
import pytest

from diffsep_tpu.data import audio_io
from diffsep_tpu.data import native_io

NATIVE_DIR = Path(__file__).resolve().parents[1] / "native"


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native_io.available():
        r = subprocess.run(["make", "-C", str(NATIVE_DIR)], capture_output=True)
        if r.returncode != 0 or not native_io.available():
            pytest.skip("native library not buildable")


def test_native_matches_scipy(tmp_path, rng):
    x = np.clip(rng.standard_normal((2, 1000)) * 0.3, -0.99, 0.99).astype(np.float32)
    audio_io.save_wav(tmp_path / "a.wav", x, 16000)
    ys, fs_s = audio_io.load_wav(tmp_path / "a.wav")
    yn, fs_n = native_io.load_wav(tmp_path / "a.wav")
    assert fs_s == fs_n == 16000
    np.testing.assert_allclose(yn, ys, atol=1e-6)


def test_native_batch(tmp_path, rng):
    paths = []
    refs = []
    for i in range(6):
        x = np.clip(rng.standard_normal((1, 300 + 50 * i)) * 0.3, -1, 1).astype(
            np.float32
        )
        p = tmp_path / f"f{i}.wav"
        audio_io.save_wav(p, x, 8000)
        paths.append(p)
        refs.append(x)
    bufs = native_io.load_wav_batch(paths, n_threads=3)
    for b, r in zip(bufs, refs):
        np.testing.assert_allclose(b, r, atol=1e-4)


def test_native_write_round_trip(tmp_path, rng):
    x = np.clip(rng.standard_normal((2, 512)) * 0.4, -0.99, 0.99).astype(np.float32)
    native_io.save_wav(tmp_path / "w.wav", x, 8000)
    y, fs = audio_io.load_wav(tmp_path / "w.wav")
    assert fs == 8000
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_backend_switch(tmp_path, rng):
    x = np.clip(rng.standard_normal((1, 200)) * 0.3, -1, 1).astype(np.float32)
    audio_io.save_wav(tmp_path / "b.wav", x, 8000)
    try:
        audio_io.set_backend("native")
        y, fs = audio_io.load_wav(tmp_path / "b.wav")
        np.testing.assert_allclose(y, x, atol=1e-4)
    finally:
        audio_io.set_backend("scipy")
