"""Worker for the 2-process multi-host fit() test (test_parallel.py).

Runs the REAL training loop (train/loop.py fit) across 2 JAX processes on
CPU: per-process loader shards feed a global-mesh dp step
(make_array_from_process_local_data), the state is replicated across
processes, validation runs under host-local EMA weights, and checkpoint/
hparams writes happen on rank 0 only (observable here because each rank
gets its OWN workdir).
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
import numpy as np

assert jax.process_count() == 2

from diffsep_tpu.config import compose
from diffsep_tpu.data.loader import DataLoader
from diffsep_tpu.model import DiffSepModel
from diffsep_tpu.train.loop import fit


class _DS:
    """Synthetic separable mixtures, deterministic per index."""

    def __init__(self, n_items=8, n_samples=1600):
        self.n_items = n_items
        self.n = n_samples

    def __len__(self):
        return self.n_items

    def __getitem__(self, i):
        rng = np.random.default_rng(1000 + i)
        tgt = rng.standard_normal((2, self.n)).astype(np.float32) * 0.1
        return tgt.sum(axis=0, keepdims=True), tgt


class _DM:
    # 3 items over 2 processes: contiguous shards of 2 and 1 exercise the
    # unbalanced-range path of the sharded post-train test eval
    datasets = {"test": _DS(3)}

    def train_dataloader(self):
        # auto-shards per process (the thing under test)
        return DataLoader(_DS(), batch_size=2, shuffle=True, prefetch=0)

    def val_dataloader(self):
        # unsharded: every process sees the full split
        return DataLoader(
            _DS(4), batch_size=2, prefetch=0, num_shards=1, shard_index=0
        )


strategy = os.environ.get("DIST_STRATEGY", "")
cfg = compose(
    # fsdp_min_size=8: the tiny test model's largest leaf is ~1k elements,
    # so the default 2**16 threshold would shard NOTHING and the
    # cross-process reshard/gather paths under test would only ever see
    # replicated arrays
    (
        [f"trainer.strategy={strategy}", "trainer.fsdp_min_size=8"]
        if strategy
        else []
    )
    + [
        "model.score_model.backbone_args.nf=4",
        "model.score_model.backbone_args.ch_mult=[1,2]",
        "model.score_model.backbone_args.num_res_blocks=1",
        "model.score_model.backbone_args.attn_resolutions=[16]",
        "model.score_model.backbone_args.image_size=32",
        "model.score_model.stft_args.n_fft=62",
        "model.score_model.stft_args.hop_length=16",
        "model.sampler.N=2",
        "model.valid_max_sep_batches=1",
        "trainer.max_epochs=1",
        "trainer.max_steps=2",
        "trainer.devices=-1",
        "trainer.check_val_every_n_epoch=1",
        "trainer.accumulate_grad_batches=1",
    ]
)
model = DiffSepModel(cfg)
# shared run dir, as on a real pod (shared storage); orbax writes from
# the primary process, rank gating covers hparams/TB/symlink
workdir = out_dir / "run"
state = fit(model, _DM(), workdir, seed=0)

step = int(np.asarray(jax.device_get(state.step)))

leaves = jax.tree_util.tree_leaves(state.params)
sharded = [l for l in leaves if not l.is_fully_replicated]
if strategy == "fsdp":
    # the whole point of the fsdp variant: some leaves must REALLY be
    # sharded across the 2 processes, or put_like/gather_host were
    # exercised on replicated arrays only
    assert sharded, "fsdp sharded no parameter leaves"

if sharded:
    from jax.sharding import NamedSharding, PartitionSpec as P

    _gather = jax.jit(
        lambda x: x, out_shardings=NamedSharding(sharded[0].sharding.mesh, P())
    )
    host_leaves = [np.asarray(jax.device_get(_gather(l))) for l in leaves]
else:
    host_leaves = [np.asarray(jax.device_get(l)) for l in leaves]

# post-train test eval: every process scores a contiguous shard, rank 0
# merges (cli/train.py test=true path — rank-gating here used to create
# exit skew that tripped the coordination-service shutdown barrier)
from diffsep_tpu.cli.evaluate import evaluate_datamodule

# the return (not the shared file) tells which rank merged: the file
# appears for BOTH ranks once rank 0 has written it, racing a file probe
_ret = evaluate_datamodule(model, state, _DM(), workdir / "test_results")
n_test_merged = len(_ret[0]) if _ret is not None else 0

report = {
    "pid": pid,
    "rank_zero": bool(is_rank_zero()),
    "step": step,
    "n_test_merged": n_test_merged,
    "n_sharded_leaves": len(sharded),
    "has_hparams": (workdir / "hparams.yaml").exists(),
    "ckpt_steps": sorted(
        p.name for p in (workdir / "checkpoints").glob("*") if p.is_dir()
    ),
    "param_sum": float(sum(np.abs(h).sum() for h in host_leaves)),
}
with open(out_dir / f"fit_p{pid}.json", "w") as f:
    json.dump(report, f)
print(f"[{pid}] FIT OK {report}", flush=True)
# leave together: a large exit skew between ranks trips the JAX
# coordination service's shutdown barrier and kills the slower one
from jax.experimental import multihost_utils as _mh
_mh.sync_global_devices("worker_done")

