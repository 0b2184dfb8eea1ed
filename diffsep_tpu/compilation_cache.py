"""Persistent XLA compilation cache setup.

NCSN++-scale programs take 25-90 s to compile (more over a remote TPU
link); enabling JAX's persistent cache makes every CLI invocation after
the first start instantly. Call `enable()` early (before the first jit
executes). Controlled by DIFFSEP_CACHE_DIR (default ~/.cache/diffsep_jax);
set DIFFSEP_CACHE_DIR=0 to disable.
"""
from __future__ import annotations

import os
from pathlib import Path


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get("DIFFSEP_CACHE_DIR")
    if cache_dir == "0":
        return
    if not cache_dir:
        cache_dir = str(Path.home() / ".cache" / "diffsep_jax")
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax versions
        pass
