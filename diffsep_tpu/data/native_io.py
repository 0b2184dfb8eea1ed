"""ctypes bindings for the native WAV I/O library (native/wavio.cpp).

TPU-native counterpart of the reference's native layer: its CUDA kernels
become XLA/Pallas compute, so the C++ here accelerates the host-side input
pipeline instead — WAV decode (incl. PCM24, which scipy lacks) and a
threaded batch decode API that keeps the device fed.

Build with `make -C native` (plain g++; no pybind11 needed — the library
exposes a C ABI consumed via ctypes).
"""
from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import List, Sequence, Tuple

import numpy as np

_LIB = None


def _find_lib() -> Path:
    here = Path(__file__).resolve().parents[2] / "native" / "libdiffsep_native.so"
    return here


def available() -> bool:
    return _find_lib().exists()


def _load():
    global _LIB
    if _LIB is None:
        path = _find_lib()
        if not path.exists():
            raise FileNotFoundError(
                f"{path} not built; run `make -C native` first"
            )
        lib = ctypes.CDLL(str(path))
        lib.wav_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.wav_read.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.wav_read_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.wav_write.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.c_int64,
            ctypes.c_int32,
        ]
        _LIB = lib
    return _LIB


def load_wav(path) -> Tuple[np.ndarray, int]:
    """(float32 (channels, frames) in [-1, 1], sample_rate)."""
    lib = _load()
    ch = ctypes.c_int32()
    nf = ctypes.c_int64()
    sr = ctypes.c_int32()
    rc = lib.wav_info(str(path).encode(), ctypes.byref(ch), ctypes.byref(nf),
                      ctypes.byref(sr))
    if rc != 0:
        raise IOError(f"cannot parse wav header: {path} (rc={rc})")
    out = np.empty((ch.value, nf.value), np.float32)
    rc = lib.wav_read(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nf.value,
    )
    if rc != 0:
        raise IOError(f"cannot decode wav data: {path} (rc={rc})")
    return out, sr.value


def load_wav_batch(paths: Sequence, n_threads: int | None = None) -> List[np.ndarray]:
    """Decode many files concurrently; returns list of (channels, frames)."""
    lib = _load()
    n = len(paths)
    infos = []
    for p in paths:
        ch = ctypes.c_int32()
        nf = ctypes.c_int64()
        sr = ctypes.c_int32()
        if lib.wav_info(str(p).encode(), ctypes.byref(ch), ctypes.byref(nf),
                        ctypes.byref(sr)) != 0:
            raise IOError(f"cannot parse wav header: {p}")
        infos.append((ch.value, nf.value))
    bufs = [np.empty((c, f), np.float32) for c, f in infos]

    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    c_outs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for b in bufs]
    )
    c_lens = (ctypes.c_int64 * n)(*[f for _, f in infos])
    n_threads = n_threads or min(8, os.cpu_count() or 1)
    failures = lib.wav_read_batch(c_paths, c_outs, c_lens, n, n_threads)
    if failures:
        raise IOError(f"{failures} files failed to decode")
    return bufs


def save_wav(path, data: np.ndarray, fs: int):
    lib = _load()
    data = np.ascontiguousarray(data, np.float32)
    if data.ndim == 1:
        data = data[None]
    rc = lib.wav_write(
        str(path).encode(),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        data.shape[0],
        data.shape[1],
        fs,
    )
    if rc != 0:
        raise IOError(f"cannot write wav: {path}")
