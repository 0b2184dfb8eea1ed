"""Training-core tests: EMA semantics, clippers, one-step DDP equivalence on
the 8-device CPU mesh, and a tiny overfit run.
"""
import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from diffsep_tpu.parallel.mesh import make_mesh, shard_batch
from diffsep_tpu.sde import MixSDE
from diffsep_tpu.train import ema as ema_lib
from diffsep_tpu.train.clippers import AutoClipper, FixedClipper, grad_norm
from diffsep_tpu.train.trainer import (
    LossConfig,
    OptimConfig,
    init_train_state,
    make_clipper,
    make_optimizer,
    make_train_step,
)


class TinyScore(nn.Module):
    """Small conv score net over (batch, src, time) for fast tests."""

    @nn.compact
    def __call__(self, xt, t, mix):
        h = jnp.concatenate([xt, jnp.broadcast_to(mix, xt.shape)], axis=1)
        h = jnp.swapaxes(h, 1, 2)  # (b, time, ch)
        temb = jnp.stack([jnp.sin(t), jnp.cos(t), jnp.log(t)], axis=-1)
        h = nn.Conv(16, (5,))(h) + nn.Dense(16)(temb)[:, None, :]
        h = nn.relu(h)
        h = nn.Conv(xt.shape[1], (5,))(h)
        return jnp.swapaxes(h, 1, 2)


def _setup(opt_cfg=None, loss_cfg=None, seed=0):
    model = TinyScore()
    rng = np.random.default_rng(seed)
    target = jnp.asarray(rng.standard_normal((8, 2, 128)).astype(np.float32))
    mix = target.sum(axis=1, keepdims=True)
    t = jnp.full((8,), 0.5)
    params = model.init(jax.random.PRNGKey(0), target, t, mix)
    apply = lambda p, x, tt, m: model.apply(p, x, tt, m)
    sde = MixSDE(ndim=2, N=30)
    opt_cfg = opt_cfg or OptimConfig(lr=1e-3)
    loss_cfg = loss_cfg or LossConfig()
    tx = make_optimizer(opt_cfg)
    clipper = make_clipper(opt_cfg)
    step_fn = make_train_step(
        apply, sde, tx, clipper, loss_cfg, opt_cfg, jax.random.PRNGKey(42)
    )
    state = init_train_state(params, tx, clipper)
    return model, apply, sde, state, step_fn, mix, target


def test_ema_num_updates_correction():
    p = {"w": jnp.ones((3,))}
    st = ema_lib.init(p)
    st = ema_lib.update(st, {"w": jnp.zeros((3,))}, decay=0.999)
    # first update: decay_t = min(0.999, 2/11)
    expected = (2.0 / 11.0) * 1.0
    np.testing.assert_allclose(np.asarray(st.params["w"]), expected, rtol=1e-6)
    assert int(st.num_updates) == 1


def test_fixed_clipper():
    g = {"a": jnp.full((4,), 10.0)}
    c = FixedClipper(max_norm=5.0)
    gc, _, (norm, thresh) = c(g, ())
    np.testing.assert_allclose(float(norm), 20.0)
    np.testing.assert_allclose(float(grad_norm(gc)), 5.0, rtol=1e-5)


def test_autoclipper_percentile():
    c = AutoClipper(p=50.0, capacity=16)
    st = c.init()
    norms = [1.0, 2.0, 3.0, 4.0]
    for n in norms:
        g = {"a": jnp.asarray([n])}
        g, st, (gn, thresh) = c(g, st)
    # history [1,2,3,4]; p=50 -> index int(0.5*4)=2 -> 3.0
    np.testing.assert_allclose(float(thresh), 3.0)


def test_train_step_decreases_loss():
    """The whitened score loss has an irreducible noise floor (it predicts
    -z), so check a statistically meaningful decrease, not a collapse."""
    _, _, _, state, step_fn, mix, target = _setup(
        opt_cfg=OptimConfig(lr=3e-3)
    )
    step = jax.jit(step_fn)
    losses = []
    for _ in range(60):
        state, metrics = step(state, mix, target)
        losses.append(float(metrics["train/score_loss"]))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) - 0.01, (
        losses[:5], losses[-5:]
    )
    assert int(state.step) == 60
    assert int(state.ema.num_updates) == 60


def test_train_step_grad_accumulation():
    cfg = OptimConfig(lr=1e-3, accumulate_grad_batches=2)
    _, _, _, state, step_fn, mix, target = _setup(opt_cfg=cfg)
    step = jax.jit(step_fn)
    p0 = state.params
    state, _ = step(state, mix, target)
    # after one micro-step nothing applied yet
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), p0, state.params
    )
    assert max(jax.tree_util.tree_leaves(diff)) == 0.0
    assert int(state.ema.num_updates) == 0
    state, _ = step(state, mix, target)
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), p0, state.params
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0.0
    assert int(state.ema.num_updates) == 1


def test_data_parallel_step_matches_single_device():
    """DDP semantics (SURVEY §2.8): the jitted step on a dp-sharded batch
    must produce the same parameters as the unsharded run."""
    _, _, _, state, step_fn, mix, target = _setup()
    step = jax.jit(step_fn)
    state_ref, m_ref = step(state, mix, target)

    mesh = make_mesh(8)
    sharded = shard_batch((mix, target), mesh)
    state_dp = jax.device_put(state, NamedSharding(mesh, P()))
    state_dp, m_dp = step(state_dp, *sharded)

    np.testing.assert_allclose(
        float(m_ref["train/score_loss"]), float(m_dp["train/score_loss"]), rtol=1e-5
    )
    ref_leaves = jax.tree_util.tree_leaves(state_ref.params)
    dp_leaves = jax.tree_util.tree_leaves(state_dp.params)
    for a, b in zip(ref_leaves, dp_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_warmup_schedule():
    from diffsep_tpu.train.trainer import make_lr_schedule

    cfg = OptimConfig(lr=2e-4, lr_warmup=10)
    s = make_lr_schedule(cfg)
    np.testing.assert_allclose(float(s(0)), 2e-5)
    np.testing.assert_allclose(float(s(9)), 2e-4)
    np.testing.assert_allclose(float(s(100)), 2e-4)


def test_validate_uses_ema_params_for_score_loss():
    """ALL of validation runs under EMA weights (reference pl_model.py:650-670
    swaps EMA in on eval()); a regression here silently diverges the logged
    val/score_loss — and checkpoint selection for configs monitoring it."""
    from types import SimpleNamespace

    from diffsep_tpu.train import ema as ema_lib
    from diffsep_tpu.train.loop import validate

    raw = {"w": jnp.asarray(1.0)}
    shadow = ema_lib.EMAState(
        params={"w": jnp.asarray(2.0)}, num_updates=jnp.asarray(5, jnp.int32)
    )
    state = SimpleNamespace(params=raw, ema=shadow)
    model = SimpleNamespace(val_losses={}, valid_max_sep_batches=0)
    dm = SimpleNamespace(
        val_dataloader=lambda: [
            (np.zeros((1, 1, 8), np.float32), np.zeros((1, 2, 8), np.float32))
        ]
    )
    # the "loss" is just the parameter value -> tells us which tree was used
    val_loss_fn = lambda params, mix, target, i: params["w"]
    out = validate(model, dm, state, val_loss_fn, jax.random.PRNGKey(0), None)
    assert out["val/score_loss"] == 2.0  # EMA value, not the raw 1.0


def test_batch_multiple_respects_mesh_divisibility():
    """Padded batches must be shardable over the dp mesh (a 3-device mesh
    used to crash on device_put: batch 6 padded to 8, 8 % 3 != 0)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffsep_tpu.parallel.mesh import make_mesh, shard_batch
    from diffsep_tpu.train.loop import batch_multiple, pad_batch_for_tpu

    # power-of-two meshes keep the layout-friendly multiple of 8
    assert batch_multiple(1) == 8
    assert batch_multiple(2) == 8
    assert batch_multiple(4) == 8
    assert batch_multiple(8) == 8
    assert batch_multiple(16) == 16
    # odd meshes: lcm would blow padding up 4x -> correctness fallback
    assert batch_multiple(3) == 3
    assert batch_multiple(6) == 6

    mix = np.random.default_rng(0).standard_normal((6, 1, 64)).astype(np.float32)
    tgt = np.zeros((6, 2, 64), np.float32)
    for n in [2, 3, 4, 6, 8]:
        mesh = make_mesh(n)
        m, t, w = pad_batch_for_tpu(mix, tgt, batch_multiple(n))
        assert m.shape[0] % n == 0, (n, m.shape)
        sharded = shard_batch(
            (jnp.asarray(m), jnp.asarray(t), jnp.asarray(w)), mesh
        )
        assert int(jax.device_get(sharded[2]).sum()) == 6  # real samples
