"""Tensor-parallel (model-sharded) inference over a 2-D dp x tp mesh.

Beyond reference parity: the reference's only parallelism is DDP (one
replica per GPU, config/trainer/allgpus.yaml) — every GPU holds the full
model and a full utterance, so per-request LATENCY is fixed at one-GPU
speed no matter how many devices exist. Here the NCSN++ weights are
sharded channel-wise over a `tp` mesh axis and the jitted reverse process
runs GSPMD: XLA propagates the parameter shardings through the convs /
GroupNorms / attention and inserts the ICI collectives itself (the
scaling-book recipe — annotate shardings, let the partitioner place
all-gathers/psums). Combined with the `dp` batch axis this serves
latency-sensitive traffic (tp shrinks time-per-utterance) and throughput
traffic (dp fans out utterances) from one mesh.

Design notes:
  * Sharding choice: each conv kernel (H, W, I, O) and dense kernel
    (I, O) is split on its OUTPUT-channel axis when divisible by the tp
    degree; channel-indexed vectors (biases, GroupNorm scale) follow
    their layer's activations; everything else stays replicated. GSPMD
    then keeps activations channel-sharded through the elementwise chain
    and reduces where a layer contracts over the sharded axis.
  * Correctness is testable without hardware: on an n-virtual-device CPU
    mesh the tp-sharded reverse process must produce the same estimate
    as the replicated one (up to float reassociation) — see
    tests/test_parallel.py and __graft_entry__.dryrun_multichip.
  * Real-pod performance is measurement work for multi-chip hardware
    (ROADMAP "Open items"); this module provides the validated mechanism.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import replicated
from .shard_eval import pad_batch_to_devices

__all__ = ["make_mesh_2d", "tp_shardings", "make_tp_separate"]


def make_mesh_2d(
    dp: int,
    tp: int,
    axis_names: Sequence[str] = ("dp", "tp"),
    devices=None,
) -> Mesh:
    """A (dp, tp) mesh over the first dp*tp devices. On real slices the
    trailing (tp) axis maps to adjacent devices, which keeps the
    tensor-parallel collectives on the fastest ICI hops (same reason
    megacore/TP axes go innermost in the scaling-book layouts)."""
    if devices is None:
        devices = jax.devices()
    need = dp * tp
    if len(devices) < need:
        raise ValueError(f"need {need} devices for a {dp}x{tp} mesh, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(dp, tp)
    return Mesh(arr, axis_names)


def tp_shardings(params, mesh: Mesh, axis: str = "tp"):
    """Channel-wise tensor-parallel sharding specs for a conv-net param
    tree: rank>=2 kernels split on the trailing (output-channel) axis,
    rank-1 channel vectors follow, anything not divisible by the tp
    degree stays replicated (XLA would otherwise pad-and-mask; for the
    NCSN++ channel counts — multiples of nf — divisibility holds at every
    layer for tp in {2, 4, 8})."""
    n = int(mesh.shape[axis])

    def spec_for(x):
        if x.ndim >= 1 and x.shape[-1] % n == 0 and x.size > n:
            parts = [None] * (x.ndim - 1) + [axis]
            return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, params)


def make_tp_separate(
    model,
    params,
    mesh: Optional[Mesh] = None,
    batch_axis: str = "dp",
    model_axis: str = "tp",
    **sampler_kwargs,
):
    """Build (key, mix) -> (est, nfe) running the whole reverse process
    with weights sharded over `model_axis` and the utterance batch over
    `batch_axis`. The batch only needs to be a multiple of the dp degree
    (tp serves each utterance cooperatively) — with tp = n_devices a
    SINGLE utterance uses the whole slice."""
    if mesh is None:
        mesh = make_mesh_2d(1, len(jax.devices()))
    dp = int(mesh.shape[batch_axis])
    params = jax.tree_util.tree_map(
        jax.device_put, params, tp_shardings(params, mesh, model_axis)
    )
    in_shard = NamedSharding(mesh, P(batch_axis))

    def run(key, mix: np.ndarray):
        mix_p, real = pad_batch_to_devices(np.asarray(mix), dp)
        mix_p = jax.device_put(jax.numpy.asarray(mix_p), in_shard)
        est, nfe = model.separate(params, key, mix_p, **sampler_kwargs)
        return est[:real], nfe

    return run
