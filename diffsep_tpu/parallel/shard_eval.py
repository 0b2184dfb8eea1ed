"""Batched multi-chip inference fan-out.

Capability parity with evaluate_mp.py's device fan-out (SURVEY.md §2.8
row "embarrassingly-parallel multi-device inference"), TPU-native: instead
of OS processes per GPU, utterances are batched and the batch axis is
sharded over the mesh's `dp` axis. The jitted sampler then runs SPMD on
every chip at once — XLA partitions the whole reverse-diffusion scan, and
no collectives are needed because the computation is batch-parallel.

`evaluate_mp` (thread-per-device) remains for the unbatched, per-utterance
timing-faithful mode; this module is the high-throughput path (same-bucket
utterances batched together).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from .mesh import data_sharding, make_mesh, replicated

__all__ = ["make_sharded_separate", "pad_batch_to_devices"]


def pad_batch_to_devices(batch: np.ndarray, n_devices: int):
    """Pad the leading axis to a multiple of the device count; returns
    (padded, real_count)."""
    b = batch.shape[0]
    target = -(-b // n_devices) * n_devices
    if target != b:
        pad = [(0, target - b)] + [(0, 0)] * (batch.ndim - 1)
        batch = np.pad(batch, pad)
    return batch, b


def make_sharded_separate(model, params, mesh=None, **sampler_kwargs):
    """Build a callable (key, mix) -> (est, nfe) that shards the utterance
    batch across all chips of `mesh` (default: all devices)."""
    if mesh is None:
        mesh = make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    in_shard = data_sharding(mesh)
    params = jax.device_put(params, replicated(mesh))

    def run(key, mix: np.ndarray):
        mix_p, real = pad_batch_to_devices(np.asarray(mix), n_dev)
        mix_p = jax.device_put(jnp.asarray(mix_p), in_shard)
        est, nfe = model.separate(params, key, mix_p, **sampler_kwargs)
        return est[:real], nfe

    return run
