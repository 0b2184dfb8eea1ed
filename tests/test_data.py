"""Data-layer tests on a synthetic WSJ0-mix / VCTK-DEMAND directory tree."""
import numpy as np
import pytest

from diffsep_tpu.data import (
    DataLoader,
    NoisyDataset,
    WSJ0_mix,
    load_wav,
    max_collator,
    save_wav,
    split_train_val,
)


@pytest.fixture
def wsj0_tree(tmp_path, rng):
    root = tmp_path / "wsj0_mix"
    base = root / "2speakers/wav8k/max/tr"
    lens = [8000, 12000, 5000]
    for d in ["mix", "s1", "s2"]:
        (base / d).mkdir(parents=True)
    for i, L in enumerate(lens):
        s1 = rng.standard_normal((1, L)).astype(np.float32) * 0.1
        s2 = rng.standard_normal((1, L)).astype(np.float32) * 0.1
        save_wav(base / f"s1/f{i}.wav", s1, 8000)
        save_wav(base / f"s2/f{i}.wav", s2, 8000)
        save_wav(base / f"mix/f{i}.wav", s1 + s2, 8000)
    return root


def test_wav_round_trip(tmp_path, rng):
    x = np.clip(rng.standard_normal((2, 1000)) * 0.3, -0.99, 0.99).astype(np.float32)
    save_wav(tmp_path / "a.wav", x, 16000)
    y, fs = load_wav(tmp_path / "a.wav")
    assert fs == 16000 and y.shape == (2, 1000)
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_wsj0_mix_dataset(wsj0_tree):
    ds = WSJ0_mix(wsj0_tree, n_spkr=2, fs=8000, cut="max", split="train")
    assert len(ds) == 3
    mix, tgt = ds[0]
    assert mix.shape[0] == 1 and tgt.shape[0] == 2
    np.testing.assert_allclose(mix[0], tgt.sum(0), atol=2e-4)


def test_wsj0_mix_crop(wsj0_tree):
    ds = WSJ0_mix(wsj0_tree, n_spkr=2, fs=8000, split="train", max_len_s=0.5)
    mix, tgt = ds[1]  # 12000-sample file cropped to 4000
    assert mix.shape[-1] == 4000 and tgt.shape[-1] == 4000


def test_wsj0_validation_errors(wsj0_tree):
    with pytest.raises(ValueError):
        WSJ0_mix(wsj0_tree, fs=44100)
    with pytest.raises(ValueError):
        WSJ0_mix(wsj0_tree, n_spkr=5, fs=8000)
    with pytest.raises(ValueError):
        WSJ0_mix(wsj0_tree, cut="bogus", fs=8000)
    with pytest.raises(ValueError):
        WSJ0_mix(wsj0_tree, split="bogus", fs=8000)


def test_max_collator_centered():
    a = (np.ones((1, 4), np.float32), np.ones((2, 4), np.float32))
    b = (np.ones((1, 8), np.float32), np.ones((2, 8), np.float32))
    mix, tgt = max_collator([a, b])
    assert mix.shape == (2, 1, 8) and tgt.shape == (2, 2, 8)
    # centered: 2 zeros both sides of the short entry
    assert mix[0, 0, 0] == 0 and mix[0, 0, 1] == 0
    assert mix[0, 0, 2] == 1 and mix[0, 0, 5] == 1 and mix[0, 0, 6] == 0


def test_max_collator_bucket():
    a = (np.ones((1, 5), np.float32),)
    (mix,) = max_collator([a], pad_to_multiple=8)
    assert mix.shape == (1, 1, 8)


def test_dataloader(wsj0_tree):
    ds = WSJ0_mix(wsj0_tree, n_spkr=2, fs=8000, split="train")
    dl = DataLoader(ds, batch_size=2, shuffle=True, seed=1)
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0][0].shape[0] == 2


def test_noisy_dataset(tmp_path, rng):
    base = tmp_path / "train"
    for d in ["noisy", "clean"]:
        (base / d).mkdir(parents=True)
    for i in range(5):
        c = rng.standard_normal((1, 20000)).astype(np.float32) * 0.1
        n = c + rng.standard_normal((1, 20000)).astype(np.float32) * 0.02
        save_wav(base / f"clean/u{i}.wav", c, 16000)
        save_wav(base / f"noisy/u{i}.wav", n, 16000)
    ds = NoisyDataset(tmp_path, audio_len=1, fs=16000, split="train")
    noisy, tgt = ds[0]
    assert noisy.shape == (1, 16000) and tgt.shape == (2, 16000)
    # enhancement-as-separation contract: tgt = [clean, noisy - clean]
    np.testing.assert_allclose(tgt[0] + tgt[1], noisy[0], atol=1e-4)

    tr, va = split_train_val(ds, val_frac=0.2, seed=0)
    assert len(tr) == 4 and len(va) == 1
    _ = tr[0]


def test_getitem_batch_matches_per_item(wsj0_tree):
    """Native thread-pooled batch decode (loader batch path) returns the
    same rows as per-item __getitem__ (no crop so rng is irrelevant)."""
    ds = WSJ0_mix(wsj0_tree, n_spkr=2, fs=8000, cut="max", split="train")
    rows_b = ds.getitem_batch([0, 2, 1])
    for got, idx in zip(rows_b, [0, 2, 1]):
        mix, tgt = ds[idx]
        np.testing.assert_allclose(got[0], mix, atol=1e-6)
        np.testing.assert_allclose(got[1], tgt, atol=1e-6)


def test_dataloader_uses_batch_decode(wsj0_tree, monkeypatch):
    ds = WSJ0_mix(wsj0_tree, n_spkr=2, fs=8000, cut="max", split="train")
    calls = []
    orig = ds.getitem_batch

    def spy(indices):
        calls.append(list(indices))
        return orig(indices)

    monkeypatch.setattr(ds, "getitem_batch", spy)
    from diffsep_tpu.data.loader import DataLoader

    dl = DataLoader(ds, batch_size=2, shuffle=False, prefetch=0)
    batches = list(dl)
    assert calls and sum(len(c) for c in calls) == len(ds)
    assert batches[0][0].shape[0] == 2
