"""VCTK-DEMAND (Valentini) noisy-speech dataset for enhancement.

Capability parity with datasets/vctk_demand.py: enhancement is cast as
2-"source" separation with target = stack[clean, noisy - clean]
(vctk_demand.py:60,77); training crops/tiles to `audio_len` seconds and can
apply channel-permutation noise augmentation (63-75); test returns the
full-length pair (59-61).
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Union

import numpy as np

from .audio_io import load_wav

split_map = {"test", "train"}


class NoisyDataset:
    def __init__(
        self,
        audio_path: Union[str, Path],
        audio_len: Union[int, float] = 4,
        fs: int = 16000,
        augmentation: bool = False,
        split: str = "train",
        rng: Optional[np.random.Generator] = None,
    ):
        if split not in split_map:
            raise ValueError(
                f"The split parameter must be 'train' or 'test' (passed {split})"
            )
        base = Path(audio_path) / split
        self.noisy_path = base / "noisy"
        self.clean_path = base / "clean"
        self.file_list = os.listdir(self.noisy_path)
        self.audio_len = int(audio_len * fs)
        self.fs = fs
        self.aug = augmentation
        self.split = split
        self.rng = rng or np.random.default_rng()

    def __len__(self):
        return len(self.file_list)

    def __getitem__(self, idx):
        noisy, _ = load_wav(self.noisy_path / self.file_list[idx])
        clean, _ = load_wav(self.clean_path / self.file_list[idx])

        if self.split == "test":
            tgt = np.concatenate([clean, noisy - clean], axis=0)
            return noisy, tgt

        ori_len = noisy.shape[-1]
        if ori_len < self.audio_len:
            reps = -(-self.audio_len // ori_len)
            noisy = np.tile(noisy, (1, reps))[..., : self.audio_len]
            clean = np.tile(clean, (1, reps))[..., : self.audio_len]
        else:
            st = int(self.rng.integers(0, ori_len - self.audio_len + 1))
            noisy = noisy[..., st : st + self.audio_len]
            clean = clean[..., st : st + self.audio_len]

        if self.aug:
            # permute the noise channels across the (single-channel) batch
            # entry — parity with vctk_demand.py:72-75
            noise = noisy - clean
            perm = self.rng.permutation(clean.shape[0])
            noisy = noise[perm] + clean

        tgt = np.concatenate([clean, noisy - clean], axis=0)
        return noisy, tgt


def split_train_val(dataset: NoisyDataset, val_frac: float = 0.1, seed: int = 0):
    """90/10 train/val split (Valentini_Module, vctk_demand.py:92-98).

    Deterministic index split (the reference uses torch random_split with
    the global seed)."""
    n = len(dataset)
    n_train = int(n * (1.0 - val_frac))
    perm = np.random.default_rng(seed).permutation(n)
    return Subset(dataset, perm[:n_train]), Subset(dataset, perm[n_train:])


class Subset:
    """Index-subset view of a dataset (torch.utils.data.Subset parity)."""

    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(int(i) for i in indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]
