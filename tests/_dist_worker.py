"""Worker for the 2-process jax.distributed CPU test (test_parallel.py).

Run as: DIST_PID=<0|1> DIST_PORT=<port> DIST_OUT=<dir> python _dist_worker.py

Exercises, on a real multi-process JAX runtime (gloo CPU collectives):
  * utils.distributed.initialize_distributed / is_rank_zero
  * DataLoader per-process train sharding (DistributedSampler semantics)
  * one data-parallel train step over the global 2-device mesh
Writes a JSON report the parent test asserts on.
"""
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

pid = int(os.environ["DIST_PID"])
port = os.environ["DIST_PORT"]
out_dir = Path(os.environ["DIST_OUT"])

from diffsep_tpu.utils.distributed import initialize_distributed, is_rank_zero

initialize_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)

import jax

assert jax.process_count() == 2, jax.process_count()
assert is_rank_zero() == (pid == 0)

import numpy as np

# --- per-process loader sharding (defaults to the JAX process topology) ---
from diffsep_tpu.data.loader import DataLoader


class _DS:
    def __len__(self):
        return 10

    def __getitem__(self, i):
        return (
            np.full((1, 32), float(i), np.float32),
            np.zeros((2, 32), np.float32),
        )


loader = DataLoader(_DS(), batch_size=5, shuffle=False, prefetch=0)
seen = [
    int(b[0][j, 0, 0]) for b in loader for j in range(b[0].shape[0])
]

# --- one dp train step over the global mesh (1 CPU device per process) ---
import flax.linen as nn
import jax.numpy as jnp
from jax.experimental import multihost_utils
from jax.sharding import Mesh, PartitionSpec as P

from diffsep_tpu.sde import MixSDE
from diffsep_tpu.train.trainer import (
    LossConfig,
    OptimConfig,
    init_train_state,
    make_clipper,
    make_optimizer,
    make_train_step,
)


class Tiny(nn.Module):
    @nn.compact
    def __call__(self, xt, t, mix):
        h = jnp.concatenate([xt, jnp.broadcast_to(mix, xt.shape)], axis=1)
        h = jnp.swapaxes(h, 1, 2)
        h = nn.Conv(8, (3,))(h) + nn.Dense(8)(t[:, None, None])
        h = nn.relu(h)
        h = nn.Conv(xt.shape[1], (3,))(h)
        return jnp.swapaxes(h, 1, 2)


model = Tiny()
rng = np.random.default_rng(0)  # same on both ranks
tgt_all = rng.standard_normal((4, 2, 32)).astype(np.float32)
# each process contributes its own half of the global batch
tgt_local = jnp.asarray(tgt_all[pid * 2 : (pid + 1) * 2])
mix_local = tgt_local.sum(axis=1, keepdims=True)

params = model.init(
    jax.random.PRNGKey(0), tgt_local, jnp.full((2,), 0.5), mix_local
)
apply = lambda p, x, tt, m: model.apply(p, x, tt, m)
sde = MixSDE(ndim=2, N=4)
opt_cfg = OptimConfig(lr=1e-3)
tx = make_optimizer(opt_cfg)
clipper = make_clipper(opt_cfg)
step_fn = make_train_step(
    apply, sde, tx, clipper, LossConfig(), opt_cfg, jax.random.PRNGKey(42)
)
state = init_train_state(params, tx, clipper)

mesh = Mesh(np.array(jax.devices()), ("dp",))
state_g = multihost_utils.host_local_array_to_global_array(
    jax.device_get(state), mesh, P()
)
mix_g = multihost_utils.host_local_array_to_global_array(
    np.asarray(mix_local), mesh, P("dp")
)
tgt_g = multihost_utils.host_local_array_to_global_array(
    np.asarray(tgt_local), mesh, P("dp")
)
state_g, metrics = jax.jit(step_fn)(state_g, mix_g, tgt_g)
loss = float(np.asarray(jax.device_get(metrics["train/score_loss"])))
step_count = int(np.asarray(jax.device_get(state_g.step)))

# --- fsdp across processes: params sharded over the global dp axis;
# XLA inserts the all-gathers / reduce-scatters over the cross-process
# collective backend (gloo here, ICI/DCN on a pod) ---
from diffsep_tpu.parallel.mesh import fsdp_shardings

params_np = jax.device_get(params)
specs = fsdp_shardings(params_np, mesh, min_size=8)
# every process holds the same full param values; make_array_from_callback
# carves out each process's addressable shard (host_local_array_to_global_
# array would instead CONCATENATE the replicas)
params_g = jax.tree_util.tree_map(
    lambda x, s: jax.make_array_from_callback(
        np.shape(x), s, lambda idx, x=x: np.asarray(x)[idx]
    ),
    params_np,
    specs,
)


def loss_fn(p, mix, tgt):
    out = model.apply(p, tgt, jnp.full((tgt.shape[0],), 0.5), mix)
    return jnp.mean((out - tgt) ** 2)


from jax.sharding import NamedSharding

fsdp_loss, fsdp_grads = jax.jit(
    jax.value_and_grad(loss_fn),
    # grads keep the ZeRO layout (reduce-scatter instead of all-reduce)
    out_shardings=(NamedSharding(mesh, P()), specs),
)(params_g, mix_g, tgt_g)
fsdp_loss = float(np.asarray(jax.device_get(fsdp_loss)))
# at least one parameter (and its grad) actually lives sharded: the
# local shard holds half the elements
n_sharded = sum(
    1
    for leaf in jax.tree_util.tree_leaves(fsdp_grads)
    if not leaf.sharding.is_fully_replicated
    and sum(s.data.size for s in leaf.addressable_shards) == leaf.size // 2
)

# --- make_run_dir must agree across ranks even with skewed wall clocks
# (rank 0's timestamp is broadcast; unfixed, a second-boundary skew split
# ranks into different run dirs and orbax saves diverged) ---
import datetime as _dt

import diffsep_tpu.cli.train as _tr


_real_dt = _tr.datetime.datetime  # == datetime.datetime (module is global)


class _Skewed(_real_dt):
    @classmethod
    def now(cls, tz=None):
        return _real_dt.now(tz) + _dt.timedelta(seconds=7 * pid)


_tr.datetime.datetime = _Skewed
try:

    class _NS:
        pass

    _cfg = _NS()
    _cfg.path = _NS()
    _cfg.path.exp_root = str(out_dir / "runs")
    _cfg.name = "dist"
    run_dir_name = _tr.make_run_dir(_cfg, []).name
finally:
    _tr.datetime.datetime = _real_dt

report = {
    "pid": pid,
    "rank_zero": bool(is_rank_zero()),
    "seen": seen,
    "loss": loss,
    "step": step_count,
    "fsdp_loss": fsdp_loss,
    "fsdp_sharded_leaves": n_sharded,
    "run_dir_name": run_dir_name,
}
with open(out_dir / f"p{pid}.json", "w") as f:
    json.dump(report, f)
print(f"[{pid}] OK {report}", flush=True)
# leave together: a large exit skew between ranks trips the JAX
# coordination service's shutdown barrier and kills the slower one
from jax.experimental import multihost_utils as _mh
_mh.sync_global_devices("worker_done")

