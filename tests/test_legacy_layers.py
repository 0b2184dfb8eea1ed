"""Legacy layer / normalization library smoke+shape tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsep_tpu.models import legacy_layers as L
from diffsep_tpu.models import normalization as N


def _x(rng, shape=(2, 8, 8, 6)):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def _init_apply(mod, *args):
    params = mod.init(jax.random.PRNGKey(0), *args)
    return mod.apply(params, *args)


def test_crp_rcu_refine(rng):
    x = _x(rng)
    assert _init_apply(L.CRPBlock(6, 2), x).shape == x.shape
    assert _init_apply(L.RCUBlock(6, 2, 2), x).shape == x.shape
    # single input: MSF (and thus output_shape) is skipped (layers.py:345-348)
    y = _init_apply(L.RefineBlock(6, end=True), [x], (16, 16))
    assert y.shape == x.shape
    # multi-input fusion
    x2 = _x(rng, (2, 4, 4, 3))
    y = _init_apply(L.RefineBlock(6), [x, x2], (8, 8))
    assert y.shape == (2, 8, 8, 6)


def test_cond_refine(rng):
    x = _x(rng)
    y_cls = jnp.asarray([0, 1])
    block = L.CondRefineBlock(
        6, num_classes=3, normalizer=N.ConditionalInstanceNorm2dPlus
    )
    out = _init_apply(block, [x], y_cls, (8, 8))
    assert out.shape == x.shape


def test_pool_convs(rng):
    x = _x(rng)
    assert _init_apply(L.ConvMeanPool(4), x).shape == (2, 4, 4, 4)
    assert _init_apply(L.MeanPoolConv(4), x).shape == (2, 4, 4, 4)
    assert _init_apply(L.UpsampleConv(4), x).shape == (2, 16, 16, 4)


@pytest.mark.parametrize("resample", [None, "down"])
def test_residual_blocks(rng, resample):
    x = _x(rng)
    out = _init_apply(L.ResidualBlock(12, resample=resample), x)
    if resample == "down":
        assert out.shape == (2, 4, 4, 12)
    else:
        assert out.shape == (2, 8, 8, 12)
    cond = L.ConditionalResidualBlock(12, num_classes=3, resample=resample)
    out = _init_apply(cond, x, jnp.asarray([0, 2]))
    assert out.shape[-1] == 12


def test_ddpm_block(rng):
    x = _x(rng, (2, 8, 8, 32))
    temb = jnp.ones((2, 16))
    block = L.ResnetBlockDDPM(act=jax.nn.silu, out_ch=32)
    params = block.init(jax.random.PRNGKey(0), x, temb)
    assert block.apply(params, x, temb).shape == x.shape


def test_normalizations(rng):
    x = _x(rng)
    y = jnp.asarray([0, 1])
    for mod in [
        N.InstanceNorm2dPlus(6),
        N.VarianceNorm2d(6),
        N.NoneNorm2d(6),
        N.InstanceNorm2d(6),
    ]:
        out = _init_apply(mod, x)
        assert out.shape == x.shape
    for mod in [
        N.ConditionalInstanceNorm2dPlus(6, 3),
        N.ConditionalVarianceNorm2d(6, 3),
        N.ConditionalInstanceNorm2d(6, 3),
        N.ConditionalNoneNorm2d(6, 3),
    ]:
        out = _init_apply(mod, x, y)
        assert out.shape == x.shape


def test_instance_norm_plus_matches_torch(rng):
    """InstanceNorm++ semantics vs the reference formula
    (normalization.py:172-203) computed with torch."""
    import torch

    x = rng.standard_normal((2, 6, 8, 8)).astype(np.float32)  # NCHW
    mod = N.InstanceNorm2dPlus(6)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)))
    alpha = 1.0 + np.asarray(params["params"]["alpha"])
    gamma = 1.0 + np.asarray(params["params"]["gamma"])
    beta = np.asarray(params["params"]["beta"])

    xt = torch.from_numpy(x)
    means = xt.mean(dim=(2, 3))
    m = means.mean(dim=-1, keepdim=True)
    v = means.var(dim=-1, keepdim=True)
    means_n = (means - m) / torch.sqrt(v + 1e-5)
    h = torch.nn.functional.instance_norm(xt)
    h = h + means_n[..., None, None] * torch.from_numpy(alpha)[None, :, None, None]
    ref = (
        torch.from_numpy(gamma)[None, :, None, None] * h
        + torch.from_numpy(beta)[None, :, None, None]
    ).numpy()

    ours = np.asarray(
        mod.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-4)
