"""Device mesh construction and sharding helpers.

The reference's parallelism is Lightning DDP over NCCL (one process per
GPU, config/trainer/allgpus.yaml) plus host process pools for evaluation
(evaluate_mp.py). TPU-native equivalent (SURVEY.md §2.8): a single
`jax.sharding.Mesh` whose `dp` axis carries data parallelism over ICI;
gradients are reduced by XLA collectives inserted by jit from sharding
annotations — no process groups, no explicit all-reduce calls.

A `fsdp` axis is exposed for parameter sharding (ZeRO-style) when models
outgrow one chip's HBM; the DiffSep-scale NCSN++ (~65M params) fits
comfortably replicated, so dp-only is the default.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "replicate_global",
    "local_device_count",
]


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("dp",),
    devices=None,
    axis_sizes: Optional[Sequence[int]] = None,
) -> Mesh:
    """1-D mesh over the available devices; multi-axis requires explicit
    `axis_sizes` (whose product must equal the device count) so an
    unexpected (n, 1, ..., 1) shape can never silently replicate what the
    caller believed was sharded. For the common dp x tp case prefer
    `parallel.tensor_parallel.make_mesh_2d`.

    With multiple processes (multi-host TPU pods), call
    `jax.distributed.initialize()` first; `jax.devices()` then spans the
    full slice and the mesh covers DCN+ICI transparently.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    arr = np.asarray(devices)
    if len(axis_names) > 1:
        if axis_sizes is None or len(axis_sizes) != len(axis_names):
            raise ValueError(
                f"make_mesh with axis_names={tuple(axis_names)} needs "
                "axis_sizes of the same length (e.g. axis_sizes=(2, 4)); "
                "a silent (n, 1, ...) reshape would replicate everything "
                "on the trailing axes"
            )
        if int(np.prod(axis_sizes)) != len(devices):
            raise ValueError(
                f"axis_sizes={tuple(axis_sizes)} does not factor the "
                f"{len(devices)} devices"
            )
        arr = arr.reshape(tuple(axis_sizes))
    return Mesh(arr, axis_names)


def data_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "dp"):
    """Device-put a host batch with the batch dim sharded over `axis`.

    Multi-process: each process passes its LOCAL batch (the per-process
    loader shard); the global batch is their concatenation along the
    batch dim (`jax.make_array_from_process_local_data`) — plain
    device_put cannot target non-addressable devices."""
    sh = data_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)
            ),
            batch,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate_global(tree, mesh: Mesh):
    """Place a host pytree fully replicated over `mesh`, including across
    processes (every process must hold the same values, e.g. from a
    shared-seed init). Single-process reduces to a plain device_put."""
    sh = replicated(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, sh)
    host = jax.device_get(tree)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_callback(
            np.shape(x), sh, lambda idx, x=x: np.asarray(x)[idx]
        ),
        host,
    )


def local_device_count() -> int:
    return jax.local_device_count()


def fsdp_shardings(params, mesh: Mesh, axis: str = "dp", min_size: int = 2**16):
    """ZeRO-3-style parameter sharding specs: each large parameter is split
    along its largest mesh-divisible axis; small ones stay replicated.

    With jit, XLA inserts the all-gathers on use and reduce-scatters on
    gradients automatically — parameter memory per chip drops ~n_devices x
    for the sharded tensors. The reference has no model-parallel analogue
    (SURVEY.md §2.8 notes 'leave room for a model axis'); this provides it
    without touching model code.
    """
    n = int(np.prod(mesh.devices.shape))

    def spec_for(x):
        if x.ndim == 0 or x.size < min_size:
            return NamedSharding(mesh, P())
        # choose the largest axis divisible by the mesh size
        cands = [(d, s) for d, s in enumerate(x.shape) if s % n == 0]
        if not cands:
            return NamedSharding(mesh, P())
        d = max(cands, key=lambda t: t[1])[0]
        parts = [None] * x.ndim
        parts[d] = axis
        return NamedSharding(mesh, P(*parts))

    return jax.tree_util.tree_map(spec_for, params)


def shard_params_fsdp(params, mesh: Mesh, axis: str = "dp"):
    """Place a parameter pytree according to `fsdp_shardings`."""
    specs = fsdp_shardings(params, mesh, axis)
    return jax.tree_util.tree_map(jax.device_put, params, specs)
