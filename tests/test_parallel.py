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
