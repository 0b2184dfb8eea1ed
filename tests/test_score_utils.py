"""score-model registry + time/label glue tests (models/score_utils.py,
parity with ncsnpp_utils/utils.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsep_tpu.models.score_utils import (
    get_ddpm_params,
    get_model,
    get_score_fn,
    get_sigmas,
    register_model,
)
from diffsep_tpu.sde import OUVESDE, OUVPSDE, MixSDE


def test_register_and_get_model():
    @register_model(name="toy")
    class Toy:
        pass

    assert get_model("toy") is Toy


def test_get_sigmas_geometric():
    s = get_sigmas(0.01, 1.0, 5)
    assert s[0] == pytest.approx(1.0) and s[-1] == pytest.approx(0.01)
    ratios = s[1:] / s[:-1]
    np.testing.assert_allclose(ratios, ratios[0], rtol=1e-6)


def test_get_ddpm_params():
    p = get_ddpm_params(0.1, 20.0, 1000)
    assert p["betas"].shape == (1000,)
    assert np.all(p["alphas_cumprod"] <= 1.0)
    np.testing.assert_allclose(
        p["sqrt_alphas_cumprod"] ** 2 + p["sqrt_1m_alphas_cumprod"] ** 2,
        1.0,
        rtol=1e-6,
    )


def test_score_fn_ouve_continuous(rng):
    sde = OUVESDE(theta=1.5, sigma_min=0.05, sigma_max=0.5, N=100)
    seen = {}

    def model_fn(x, labels):
        seen["labels"] = labels
        return -x

    score = get_score_fn(sde, model_fn, continuous=True)
    x = jnp.asarray(rng.standard_normal((2, 1, 8)).astype(np.float32))
    t = jnp.asarray([0.3, 0.8])
    out = score(x, t, jnp.zeros_like(x))
    # continuous OUVE convention: labels are the marginal std
    np.testing.assert_allclose(
        np.asarray(seen["labels"]), np.asarray(sde._std(t)), rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out), -np.asarray(x))


def test_score_fn_ouvp_scaling(rng):
    sde = OUVPSDE(beta_min=0.01, beta_max=1.0, N=100)

    def model_fn(x, labels):
        return jnp.ones_like(x)

    score = get_score_fn(sde, model_fn, continuous=True)
    x = jnp.asarray(rng.standard_normal((2, 1, 8)).astype(np.float32))
    t = jnp.asarray([0.3, 0.8])
    out = np.asarray(score(x, t, jnp.zeros_like(x)))
    std = np.asarray(sde._std(t))
    # VP convention: score = -eps_hat / std
    np.testing.assert_allclose(
        out, np.broadcast_to(-1.0 / std[:, None, None], out.shape), rtol=1e-5
    )


def test_score_fn_rejects_mix_sde():
    with pytest.raises(NotImplementedError):
        get_score_fn(MixSDE(), lambda x, l: x)
