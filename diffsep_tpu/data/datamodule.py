"""DataModules binding the config tree to datasets + loaders.

Capability parity with WSJ0_mix_Module (wsj0_mix.py:114-138) and
Valentini_Module (vctk_demand.py:82-114).
"""
from __future__ import annotations

from typing import Optional

from ..config import instantiate
from .loader import DataLoader
from .vctk_demand import split_train_val


def _dl(dataset, dl_opts, seed=0, pad_to_multiple=None, shard=True):
    opts = dict(dl_opts or {})
    # shard=True -> per-process train shard (DataLoader defaults to the JAX
    # process topology, like Lightning's DistributedSampler under DDP);
    # validation/test loaders pass shard=False so every process sees the
    # full split and logged metrics are identical on all ranks
    shard_kw = {} if shard else {"num_shards": 1, "shard_index": 0}
    return DataLoader(
        dataset,
        batch_size=int(opts.get("batch_size", 1)),
        shuffle=bool(opts.get("shuffle", False)),
        num_workers=int(opts.get("num_workers", 0)),
        seed=seed,
        pad_to_multiple=pad_to_multiple,
        **shard_kw,
    )


class WSJ0_mix_Module:
    def __init__(self, config, pad_to_multiple: Optional[int] = None):
        self.cfg = config
        self.pad_to_multiple = pad_to_multiple
        self.datasets = {}

    def setup(self, splits=("train", "val", "test")):
        # lazy per-split instantiation: extra eval splits (libri-clean/
        # libri-noisy) are only touched when actually requested
        for split in splits:
            node = self.cfg.datamodule.get(split)
            if split not in self.datasets and node and "dataset" in node:
                self.datasets[split] = instantiate(node["dataset"])

    def _get(self, split):
        if split not in self.datasets:
            self.setup((split,))
        return _dl(
            self.datasets[split],
            self.cfg.datamodule[split].get("dl_opts"),
            seed=int(self.cfg.get("seed", 0)),
            pad_to_multiple=self.pad_to_multiple,
            shard=(split == "train"),
        )

    def train_dataloader(self):
        return self._get("train")

    def val_dataloader(self):
        return self._get("val")

    def test_dataloader(self):
        return self._get("test")


class Valentini_Module:
    """Enhancement datamodule: the train set is split 90/10 into train/val
    (vctk_demand.py:92-98)."""

    def __init__(self, config, pad_to_multiple: Optional[int] = None):
        self.cfg = config
        self.pad_to_multiple = pad_to_multiple
        self.datasets = {}

    def setup(self):
        train = instantiate(self.cfg.datamodule["train"]["dataset"])
        self.datasets["train"], self.datasets["val"] = split_train_val(
            train, val_frac=0.1, seed=int(self.cfg.get("seed", 0))
        )
        self.datasets["test"] = instantiate(self.cfg.datamodule["test"]["dataset"])

    def _get(self, split):
        if not self.datasets:
            self.setup()
        return _dl(
            self.datasets[split],
            self.cfg.datamodule[split].get("dl_opts"),
            seed=int(self.cfg.get("seed", 0)),
            pad_to_multiple=self.pad_to_multiple,
            shard=(split == "train"),
        )

    def train_dataloader(self):
        return self._get("train")

    def val_dataloader(self):
        return self._get("val")

    def test_dataloader(self):
        return self._get("test")
