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
    """Initialize the JAX multi-process runtime when a pod/cluster
    environment is detected; a no-op on single-host runs.

    On TPU pods the coordinator address and process count are auto-detected
    from the TPU metadata / cluster env (JAX_COORDINATOR_ADDRESS etc.)."""
    import os

    cluster_env = any(
        os.environ.get(k)
        for k in (
            "JAX_COORDINATOR_ADDRESS",
            "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS",
        )
    )
    if not cluster_env and not kwargs:
        return
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError) as e:  # pragma: no cover
        import logging

        logging.getLogger(__name__).warning(
            "jax.distributed.initialize failed (%s); continuing single-process", e
        )
