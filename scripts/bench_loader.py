#!/usr/bin/env python
"""Input-pipeline headroom measurement (VERDICT round-1 item 7).

Builds a synthetic WSJ0-2mix-shaped tree of 5 s / 8 kHz wavs, then
measures DataLoader throughput (batch 6, the icassp recipe) with
  (a) per-item python decode (the round-1 path)
  (b) the native thread-pooled batch decoder (wav_read_batch)
and compares against the measured train-step time to show whether the
loop is compute-bound.

Run: python scripts/bench_loader.py [n_files]
"""
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from diffsep_tpu.data.loader import DataLoader
from diffsep_tpu.data.wsj0_mix import WSJ0_mix
from diffsep_tpu.data.audio_io import save_wav

TRAIN_STEP_MS = 241.6  # f32+remat padded recipe step (scripts/perf_train.py)


def build_tree(root: Path, n_files: int, fs=8000, sec=5.0):
    base = root / "2speakers/wav8k/max/tr"
    rng = np.random.default_rng(0)
    for d in ("mix", "s1", "s2"):
        (base / d).mkdir(parents=True)
    L = int(fs * sec)
    for i in range(n_files):
        s1 = (rng.standard_normal((1, L)) * 0.1).astype(np.float32)
        s2 = (rng.standard_normal((1, L)) * 0.1).astype(np.float32)
        save_wav(base / f"s1/f{i:04d}.wav", s1, fs)
        save_wav(base / f"s2/f{i:04d}.wav", s2, fs)
        save_wav(base / f"mix/f{i:04d}.wav", s1 + s2, fs)
    return root


def measure(ds, batch_size=6, use_batch_decode=True, epochs=2):
    if not use_batch_decode and hasattr(ds, "getitem_batch"):
        ds = _NoBatch(ds)
    dl = DataLoader(ds, batch_size=batch_size, shuffle=True, prefetch=0)
    n = 0
    t0 = time.perf_counter()
    for _ in range(epochs):
        for mix, tgt in dl:
            n += 1
    dt = time.perf_counter() - t0
    return n / dt, dt / n * 1e3


class _NoBatch:
    def __init__(self, ds):
        self._ds = ds

    def __len__(self):
        return len(self._ds)

    def __getitem__(self, i):
        return self._ds[i]


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    with tempfile.TemporaryDirectory() as td:
        root = build_tree(Path(td) / "wsj0_mix", n_files)
        ds = WSJ0_mix(root, n_spkr=2, fs=8000, cut="max", split="train",
                      max_len_s=5.0)
        bps_item, ms_item = measure(ds, use_batch_decode=False)
        bps_nat, ms_nat = measure(ds, use_batch_decode=True)
        print(f"per-item decode : {bps_item:7.1f} batches/s ({ms_item:6.2f} ms/batch)")
        print(f"native batch    : {bps_nat:7.1f} batches/s ({ms_nat:6.2f} ms/batch)")
        print(
            f"train step      : {TRAIN_STEP_MS:.1f} ms/step -> loader uses "
            f"{ms_nat / TRAIN_STEP_MS * 100:.1f}% of a step (native), "
            f"{ms_item / TRAIN_STEP_MS * 100:.1f}% (per-item); prefetch "
            "thread overlaps this with device compute."
        )


if __name__ == "__main__":
    main()
