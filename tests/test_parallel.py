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
