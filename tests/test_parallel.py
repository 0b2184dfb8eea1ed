"""Sharded-inference tests on the 8-device CPU mesh."""
import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffsep_tpu.parallel import (
    make_mesh,
    make_sharded_separate,
    pad_batch_to_devices,
)


class _TinyModel:
    """Minimal object with the DiffSepModel.separate contract."""

    def __init__(self):
        from diffsep_tpu.sde import MixSDE

        self.sde = MixSDE(ndim=2, N=4)
        self.t_eps = 0.03
        self.sampler_kwargs = {}

    def score_apply(self, params, x, t, mix):
        return -x * params["scale"]

    def separate(self, params, key, mix, **kw):
        from diffsep_tpu.model import DiffSepModel

        return DiffSepModel.separate(self, params, key, mix, **kw)


def test_pad_batch_to_devices():
    x = np.ones((5, 1, 16))
    p, real = pad_batch_to_devices(x, 8)
    assert p.shape[0] == 8 and real == 5
    p, real = pad_batch_to_devices(np.ones((8, 1, 16)), 8)
    assert p.shape[0] == 8 and real == 8


def test_fsdp_param_sharding_matches_replicated(rng):
    """ZeRO-style parameter sharding must not change the training math:
    a train step with fsdp-sharded params equals the replicated run."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from diffsep_tpu.parallel import fsdp_shardings, shard_params_fsdp
    from tests.test_trainer import _setup

    _, _, _, state, step_fn, mix, target = _setup()
    step = jax.jit(step_fn)
    s_ref, m_ref = step(state, mix, target)

    mesh = make_mesh(8)
    # shard params + ema with min_size=1 so even tiny test params shard
    from diffsep_tpu.parallel.mesh import fsdp_shardings as _fs

    specs = _fs(state.params, mesh, min_size=1)
    sharded_params = jax.tree_util.tree_map(jax.device_put, state.params, specs)
    assert any(
        s.spec != P() for s in jax.tree_util.tree_leaves(specs)
    ), "at least one param should actually shard"
    state_dp = state.replace(params=sharded_params)
    state_dp = jax.device_put(state_dp, NamedSharding(mesh, P()))
    state_dp = state_dp.replace(params=sharded_params)
    batch = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("dp"))), (mix, target)
    )
    s_dp, m_dp = step(state_dp, *batch)
    np.testing.assert_allclose(
        float(m_ref["train/score_loss"]), float(m_dp["train/score_loss"]),
        rtol=1e-5,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_ref.params),
        jax.tree_util.tree_leaves(s_dp.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_separate_matches_single_device(rng):
    model = _TinyModel()
    params = {"scale": jnp.asarray(0.7)}
    mix = rng.standard_normal((5, 1, 64)).astype(np.float32)
    key = jax.random.PRNGKey(0)

    est_single, nfe = model.separate(params, key, jnp.asarray(
        pad_batch_to_devices(mix, 8)[0]
    ))

    mesh = make_mesh(8)
    run = make_sharded_separate(model, params, mesh, N=4)
    est_sharded, nfe2 = run(key, mix)

    assert est_sharded.shape == (5, 2, 64)
    np.testing.assert_allclose(
        np.asarray(est_sharded), np.asarray(est_single)[:5], atol=1e-5
    )


# ---------------------------------------------------------------------------
# Multi-process (multi-host) path: loader sharding + 2-process CPU runtime
# ---------------------------------------------------------------------------


def test_loader_shards_are_disjoint_and_cover():
    """DistributedSampler semantics (reference config/trainer/allgpus.yaml:8):
    same seeded permutation on every rank, wrap-padded to a multiple of the
    process count, rank-strided subsets."""
    from diffsep_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 11  # deliberately not a multiple of 3

        def __getitem__(self, i):
            return (np.full((1, 4), float(i), np.float32),
                    np.zeros((2, 4), np.float32))

    def seen(shard_index, num_shards, shuffle=False):
        dl = DataLoader(
            DS(), batch_size=4, shuffle=shuffle, prefetch=0, seed=7,
            num_shards=num_shards, shard_index=shard_index,
        )
        n_shard = -(-11 // num_shards) if num_shards > 1 else 11
        assert len(dl) == -(-n_shard // 4)
        return [int(b[0][j, 0, 0]) for b in dl for j in range(b[0].shape[0])]

    shards = [seen(i, 3) for i in range(3)]
    # equal length on every rank (11 wrap-padded to 12)
    assert all(len(s) == 4 for s in shards)
    # together they cover the dataset; only the wrap item repeats
    flat = sorted(sum(shards, []))
    assert set(flat) == set(range(11))
    # shuffle draws the SAME permutation on every rank -> still a partition
    shards = [seen(i, 3, shuffle=True) for i in range(3)]
    assert set(sum(shards, [])) == set(range(11))

    # num_shards=1 (validation loaders) sees everything
    assert sorted(seen(0, 1)) == list(range(11))

    with pytest.raises(ValueError):
        DataLoader(DS(), num_shards=2, shard_index=5)


def test_two_process_distributed_cpu(tmp_path):
    """Spawn 2 real processes with jax.distributed.initialize on CPU (gloo
    collectives): initialize_distributed + is_rank_zero + per-process
    loader shards + one dp train step over the global 2-device mesh."""
    import json
    import os
    import socket
    import subprocess
    import sys
    from pathlib import Path

    worker = Path(__file__).parent / "_dist_worker.py"
    with socket.socket() as s:  # free port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ, JAX_PLATFORMS="cpu", DIST_PORT=str(port),
               DIST_OUT=str(tmp_path))
    env.pop("PALLAS_AXON_POOL_IPS", None)  # sitecustomize would force TPU
    env.pop("XLA_FLAGS", None)  # 1 device per process, not 8
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker)],
            env=dict(env, DIST_PID=str(i)),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]

    reports = [json.load(open(tmp_path / f"p{i}.json")) for i in range(2)]
    assert reports[0]["rank_zero"] is True
    assert reports[1]["rank_zero"] is False
    # loader shards: disjoint, equal-size halves of range(10)
    s0, s1 = set(reports[0]["seen"]), set(reports[1]["seen"])
    assert len(s0) == len(s1) == 5
    assert s0.isdisjoint(s1)
    assert s0 | s1 == set(range(10))
    # the dp step ran globally: same replicated loss on both ranks
    assert reports[0]["step"] == reports[1]["step"] == 1
    np.testing.assert_allclose(reports[0]["loss"], reports[1]["loss"], rtol=1e-6)
    # fsdp across processes: params/grads genuinely sharded (half the
    # elements per process), identical loss on both ranks
    assert reports[0]["fsdp_sharded_leaves"] >= 1
    assert reports[0]["fsdp_sharded_leaves"] == reports[1]["fsdp_sharded_leaves"]
    np.testing.assert_allclose(
        reports[0]["fsdp_loss"], reports[1]["fsdp_loss"], rtol=1e-6
    )
    # make_run_dir broadcast: identical dir name despite a 7 s clock skew
    # injected on rank 1 (unfixed, ranks split into different run dirs and
    # every-rank orbax saves diverged)
    assert reports[0]["run_dir_name"] == reports[1]["run_dir_name"]
    assert np.isfinite(reports[0]["fsdp_loss"])


@pytest.mark.parametrize("strategy", ["", "fsdp"])
def test_two_process_fit_cpu(tmp_path, strategy):
    """The REAL training loop across 2 processes: per-process loader
    shards -> global-mesh dp step, replicated state, all-process orbax
    save into a shared run dir (rank-gating only the host-side extras —
    a rank-gated orbax save deadlocks its internal barrier). The fsdp
    variant additionally drives the jit-identity resharding and the
    gather-before-validate/checkpoint path (eager device_get/device_put
    cannot touch cross-process shardings)."""
    import json
    import os
    import socket
    import subprocess
    import sys
    from pathlib import Path

    worker = Path(__file__).parent / "_dist_fit_worker.py"
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ, JAX_PLATFORMS="cpu", DIST_PORT=str(port),
               DIST_OUT=str(tmp_path), DIST_STRATEGY=strategy)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker)],
            env=dict(env, DIST_PID=str(i)),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=1500)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]
    reports = [json.load(open(tmp_path / f"fit_p{i}.json")) for i in range(2)]
    assert [r["rank_zero"] for r in reports] == [True, False]
    assert reports[0]["step"] == reports[1]["step"] == 2
    # checkpoint landed in the SHARED run dir, written once
    assert reports[0]["ckpt_steps"] == reports[1]["ckpt_steps"] != []
    assert reports[0]["has_hparams"] and reports[1]["has_hparams"]
    # replicated state identical on both ranks after the global dp steps
    np.testing.assert_allclose(
        reports[0]["param_sum"], reports[1]["param_sum"], rtol=1e-6
    )
    # post-train test eval: sharded per process (2+1 of the 3 items),
    # merged on rank 0 only
    assert reports[0]["n_test_merged"] == 3
    assert reports[1]["n_test_merged"] == 0


def test_tp_separate_matches_replicated():
    """Tensor-parallel inference (weights channel-sharded over the tp mesh
    axis, GSPMD-inserted collectives) must reproduce the replicated
    reverse process on the REAL (tiny) NCSN++ — float-reassociation noise
    only."""
    import __graft_entry__ as g
    from diffsep_tpu.parallel import (
        make_mesh_2d,
        make_tp_separate,
        tp_shardings,
    )
    from jax.sharding import PartitionSpec as P

    model = g._flagship_model(tiny=True)
    rng = np.random.default_rng(0)
    fs = 800
    mix = (rng.standard_normal((4, 1, fs)) * 0.1).astype(np.float32)
    tgt = np.zeros((4, 2, fs), np.float32)
    params = model.init_params(
        jax.random.PRNGKey(0), jnp.asarray(mix), jnp.asarray(tgt)
    )

    key = jax.random.PRNGKey(3)
    want, _ = model.separate(params, key, jnp.asarray(mix), N=2)

    mesh = make_mesh_2d(2, 4)  # 2-way data x 4-way tensor parallel
    specs = tp_shardings(params, mesh)
    n_sharded = sum(
        1 for s in jax.tree_util.tree_leaves(specs) if s.spec != P()
    )
    assert n_sharded > 10, "conv/dense kernels should actually shard"

    run = make_tp_separate(model, params, mesh, N=2)
    got, _ = run(key, mix)
    assert got.shape == (4, 2, fs)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4
    )


def test_tp_single_utterance_whole_mesh():
    """tp = n_devices: ONE utterance is served cooperatively by all 8
    devices (the latency configuration DDP cannot express)."""
    import __graft_entry__ as g
    from diffsep_tpu.parallel import make_mesh_2d, make_tp_separate

    model = g._flagship_model(tiny=True)
    rng = np.random.default_rng(1)
    fs = 800
    mix = (rng.standard_normal((1, 1, fs)) * 0.1).astype(np.float32)
    params = model.init_params(
        jax.random.PRNGKey(0), jnp.asarray(mix),
        jnp.zeros((1, 2, fs), jnp.float32),
    )
    mesh = make_mesh_2d(1, 8)
    run = make_tp_separate(model, params, mesh, N=2)
    est, _ = run(jax.random.PRNGKey(0), mix)
    assert est.shape == (1, 2, fs)
    assert np.isfinite(np.asarray(est)).all()


def test_batched_eval_normalizes_on_true_length():
    """evaluate_range_batched must normalize each utterance on its TRUE
    length before zero-padding to the bucket (the shared serving rule,
    train/losses.py:normalize_rows_host) — padding first deflated std by
    ~sqrt(true/padded) and fed the network a hotter-than-training input."""
    import jax
    import jax.numpy as jnp

    from diffsep_tpu.cli.evaluate_mp import evaluate_range_batched

    fs = 8000
    n_true = 4000  # 0.5 s in a 1.0 s bucket -> pad doubles the length
    rng = np.random.default_rng(0)
    target = rng.standard_normal((2, n_true)).astype(np.float32) * 0.2
    mix = target.sum(axis=0, keepdims=True) + 0.3  # nonzero mean

    class DS:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            return mix, target

    captured = []

    class StubModel:
        def get_pc_sampler(self, pred, corr, y, params, key=None, **kw):
            captured.append(np.asarray(y))

            def sampler():
                return (
                    jnp.concatenate([y, y], axis=1),  # (b, 2, n) estimate
                    jnp.asarray(2),
                )

            return sampler

    rows = evaluate_range_batched(
        StubModel(), {}, DS(), 0, 1, jax.devices("cpu")[0], fs, 2,
        sampler_kwargs={}, pesq_mode="nb", stoi_extended=False, seed=0,
        batch_size=2, bucket_s=1.0,
    )
    assert len(rows) == 1 and len(captured) == 1
    row = captured[0][0, 0]  # first (real) row of the sampler input
    assert row.shape[-1] == fs  # padded to the 1 s bucket
    # true span is normalized to exactly zero-mean / unit-std (ddof=1)...
    assert abs(float(row[:n_true].mean())) < 1e-5
    assert abs(float(row[:n_true].std(ddof=1)) - 1.0) < 1e-4
    # ...and the pad tail is exactly zero (not -mean/std)
    assert np.all(row[n_true:] == 0.0)


def test_make_mesh_multi_axis_requires_sizes():
    """Multi-axis make_mesh must be explicit: the old silent (n, 1, ...)
    reshape replicated everything on the trailing axes while the caller
    believed it was sharded."""
    import pytest as _pytest

    from diffsep_tpu.parallel.mesh import make_mesh

    with _pytest.raises(ValueError, match="axis_sizes"):
        make_mesh(8, axis_names=("dp", "fsdp"))
    with _pytest.raises(ValueError, match="factor"):
        make_mesh(8, axis_names=("dp", "fsdp"), axis_sizes=(3, 2))
    m = make_mesh(8, axis_names=("dp", "fsdp"), axis_sizes=(2, 4))
    assert dict(m.shape) == {"dp": 2, "fsdp": 4}
