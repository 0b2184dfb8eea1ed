"""Sharded output directories.

Capability parity with utils/split_dir.py:5-47 (`SplitDirectory`): when
writing thousands of result files, shard them into numbered subdirectories
of at most `max_files` entries to keep filesystems happy.
"""
from __future__ import annotations

from pathlib import Path


class SplitDirectory:
    def __init__(self, root, max_files: int = 1000):
        self.root = Path(root)
        self.max_files = max_files
        self._count = 0

    def path_for(self, filename: str) -> Path:
        shard = self._count // self.max_files
        self._count += 1
        d = self.root / f"{shard:04d}"
        d.mkdir(parents=True, exist_ok=True)
        return d / filename

    def __truediv__(self, filename: str) -> Path:
        return self.path_for(filename)
