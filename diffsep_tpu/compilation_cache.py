"""Persistent XLA compilation cache setup.

NCSN++-scale programs take 25-90 s to compile (more over a remote TPU
link); enabling JAX's persistent cache makes every CLI invocation after
the first start instantly. Call `enable()` early (before the first jit
executes). Controlled by DIFFSEP_CACHE_DIR (default ~/.cache/diffsep_jax);
set DIFFSEP_CACHE_DIR=0 to disable.

`enable()` also keeps the local CPU backend REGISTERED when JAX_PLATFORMS
pins a remote platform (e.g. `axon`): model.init_params runs the
parameter-init program on the CPU backend so the ~260 MB flat result
never crosses the ~38 MB/s remote D2H tunnel (measured ~540 s of pure
transfer per process without it). Appending `,cpu` leaves the remote
platform first in the priority list, so the default backend is unchanged.
"""
from __future__ import annotations

import os
from pathlib import Path


def enable(cache_dir: str | None = None) -> None:
    plats = os.environ.get("JAX_PLATFORMS")
    if plats and "cpu" not in [p.strip() for p in plats.split(",")]:
        # must happen before the (lazy) backend initialization; a no-op if
        # backends are already up
        os.environ["JAX_PLATFORMS"] = plats + ",cpu"

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
