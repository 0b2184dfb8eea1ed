"""Batch loading with background prefetch.

The reference relies on torch DataLoader worker processes
(config/datamodule/default.yaml dl_opts). TPU-native equivalent: a simple
shuffling batch iterator with a background prefetch thread that overlaps
host wav decoding with device compute, plus shape bucketing
(`pad_to_multiple`) so XLA compiles a handful of batch shapes instead of
one per utterance length.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np

from .wsj0_mix import max_collator


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        collate_fn: Callable = max_collator,
        drop_last: bool = False,
        seed: int = 0,
        prefetch: int = 2,
        pad_to_multiple: Optional[int] = None,
        num_workers: int = 0,  # accepted for config parity; threads used
        num_shards: Optional[int] = None,
        shard_index: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.collate_fn = collate_fn
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        self.pad_to_multiple = pad_to_multiple
        # per-process dataset shard (reference semantics: Lightning wraps
        # the train loader in a DistributedSampler under DDP,
        # config/trainer/allgpus.yaml:8): every process draws the SAME
        # seeded permutation, pads it by wrapping to a multiple of the
        # process count so all ranks see equally many batches, and takes
        # its rank-strided subset. Defaults to the JAX process topology;
        # pass num_shards=1 to disable (e.g. for validation loaders that
        # should see the full split on every process).
        if num_shards is None:
            import jax

            num_shards = jax.process_count()
            shard_index = jax.process_index()
        elif num_shards > 1 and shard_index is None:
            # an explicit multi-way split without a rank would silently give
            # every caller shard 0 (duplicated data, 1-1/N never seen)
            raise ValueError("shard_index is required when num_shards > 1")
        self.num_shards = max(int(num_shards), 1)
        self.shard_index = int(shard_index or 0)
        if not (0 <= self.shard_index < self.num_shards):
            raise ValueError(
                f"shard_index {shard_index} not in [0, {num_shards})"
            )

    def _shard(self, idx: np.ndarray) -> np.ndarray:
        if self.num_shards == 1:
            return idx
        pad = (-len(idx)) % self.num_shards
        if pad:
            idx = np.concatenate([idx, idx[:pad]])  # wrap like Lightning
        return idx[self.shard_index :: self.num_shards]

    def __len__(self):
        n = len(self._shard(np.arange(len(self.dataset))))
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batches(self) -> Iterator:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        idx = self._shard(idx)
        for s in range(0, len(idx), self.batch_size):
            chunk = idx[s : s + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            if hasattr(self.dataset, "getitem_batch"):
                # native thread-pooled batch decode (data/native_io.py)
                rows = self.dataset.getitem_batch([int(i) for i in chunk])
            else:
                rows = [self.dataset[int(i)] for i in chunk]
            if self.pad_to_multiple:
                yield self.collate_fn(rows, pad_to_multiple=self.pad_to_multiple)
            else:
                yield self.collate_fn(rows)

    def __iter__(self):
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err = []

        def worker():
            try:
                for b in self._batches():
                    q.put(b)
            except Exception as e:  # pragma: no cover
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        if err:
            raise err[0]
