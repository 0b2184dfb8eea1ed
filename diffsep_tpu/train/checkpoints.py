"""Orbax checkpointing with top-k selection and a best-model symlink.

Capability parity with the reference's checkpoint/resume subsystem
(SURVEY.md §5): ModelCheckpoint(save_top_k=20, monitor=val/si_sdr,
mode=max) (train.py:105-116), EMA state embedded in every checkpoint
(pl_model.py:672-673), resume (train.py:140-144), and the best-model
symlink monkey-patch (utils/checkpoint_symlink.py:20-43) — here a
first-class feature.

The checkpoint payload is the full TrainState (params, EMA params +
counter, optimizer state, clipper state, step), so resume is exact.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager", "symlink_force"]


def symlink_force(target, link_name):
    """Atomic-ish forced symlink (utils/checkpoint_symlink.py:8-17)."""
    tmp = str(link_name) + ".tmp"
    try:
        os.remove(tmp)
    except FileNotFoundError:
        pass
    os.symlink(target, tmp)
    os.replace(tmp, link_name)


class CheckpointManager:
    def __init__(
        self,
        directory,
        max_to_keep: int = 20,
        monitor: str = "val/si_sdr",
        mode: str = "max",
        best_symlink: bool = True,
    ):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.best_symlink = best_symlink
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=(lambda m: m.get(self.monitor, -np.inf)) if monitor else None,
            best_mode="max" if mode == "max" else "min",
            enable_async_checkpointing=False,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state, metrics: Optional[Dict[str, float]] = None):
        metrics = {
            k: float(v) for k, v in (metrics or {}).items() if np.isfinite(v)
        }
        # Deep-copy to host: XLA CSE can make distinct logical leaves (e.g.
        # state.step and ema.num_updates, both `old + 1`) share one device
        # buffer, which orbax then deduplicates — silently dropping a leaf
        # from the store and breaking restore. Independent host copies make
        # every leaf a distinct array.
        state = jax.tree_util.tree_map(
            lambda x: np.array(x, copy=True), jax.device_get(state)
        )
        self._mgr.save(
            step, args=ocp.args.StandardSave(state), metrics=metrics or None
        )
        self._mgr.wait_until_finished()
        # host-side extras happen on the primary process only (orbax above
        # coordinates multi-host itself and writes from the primary)
        if jax.process_index() != 0:
            return
        if self.best_symlink and metrics and self.monitor in metrics:
            best = self._mgr.best_step()
            if best is not None:
                symlink_force(
                    str(self.directory / str(best)),
                    str(self.directory / "best-model"),
                )

    def restore(self, state_template, step: Optional[int] = None):
        """Restore into the structure of `state_template` (abstract or
        concrete pytree)."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def all_steps(self):
        return self._mgr.all_steps()

    def close(self):
        self._mgr.close()
