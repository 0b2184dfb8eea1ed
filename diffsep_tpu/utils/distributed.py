"""Multi-process (multi-host) helpers.

Capability parity with utils/ddp.py:4-10 (`is_rank_zero`): the reference
reads Lightning's LOCAL_RANK/NODE_RANK env; on TPU pods the process index
comes from the JAX runtime after `jax.distributed.initialize()`.
"""
from __future__ import annotations

import jax


def is_rank_zero() -> bool:
    """True on the process that should write logs/checkpoints."""
    return jax.process_index() == 0


def initialize_distributed(**kwargs) -> None:
    """Initialize the JAX multi-process runtime (no-op when single
    process). On TPU pods the coordinator/process env is auto-detected."""
    if jax.process_count() > 1:
        return
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        pass  # single-process run
