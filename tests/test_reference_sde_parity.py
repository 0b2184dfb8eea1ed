"""SDE-family parity against the ACTUAL reference sdes/sdes.py run
in-process.

test_sde.py pins our closed forms by self-consistency, simulation, and a
torch-avgpool oracle; test_reference_pipeline_parity.py pins MixSDE through
the full pipeline.  These tests close the remaining gap: PriorMixSDE (the
enhancement recipe's SDE — per-sample power-envelope std tensor, einsum
mult_std, the manual 2x2 solve), OUVESDE/OUVPSDE (drift/diffusion/marginal/
discretize), and the varprop time sampler's DISTRIBUTION (our inverse-CDF
vs the reference's rejection sampler) — all vs the reference classes
imported and executed directly.
"""
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.test_reference_pipeline_parity import REF, _install_pl_stub

pytestmark = pytest.mark.skipif(
    not (REF / "sdes/sdes.py").exists(),
    reason="reference checkout not available",
)


@pytest.fixture(scope="module")
def ref_sdes_mod():
    _install_pl_stub()
    sys.path.insert(0, str(REF))
    try:
        import sdes.sdes as mod
    finally:
        sys.path.remove(str(REF))
    return mod


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


PRIORMIX = dict(ndim=2, d_lambda=2.0, sigma_min=0.05, sigma_max=0.5, N=30,
                avg_len=32)


def test_priormix_marginal_parity(ref_sdes_mod, rng):
    """Mean, the (batch, n_src, n_src, n) std TENSOR via mult_std, and the
    manual 2x2 mult_std_inv (sdes.py:477-557) on random vectors."""
    from diffsep_tpu.sde import PriorMixSDE

    ref = ref_sdes_mod.PriorMixSDE(**PRIORMIX)
    ours = PriorMixSDE(**PRIORMIX)

    x0 = _rand(rng, 3, 2, 200) * 0.5
    mix = x0.sum(axis=1, keepdims=True)
    z = _rand(rng, 3, 2, 200)
    for tval in [0.05, 0.4, 1.0]:
        t = np.full((3,), tval, np.float32)
        mean_r, L_r = ref.marginal_prob(
            torch.from_numpy(x0), torch.from_numpy(t), torch.from_numpy(mix)
        )
        Lz_r = ref.mult_std(L_r, torch.from_numpy(z))
        inv_r = ref.mult_std_inv(L_r, torch.from_numpy(z))

        mean_o, L_o = ours.marginal_prob(
            jnp.asarray(x0), jnp.asarray(t), jnp.asarray(mix)
        )
        Lz_o = ours.mult_std(L_o, jnp.asarray(z))
        inv_o = ours.mult_std_inv(L_o, jnp.asarray(z))

        np.testing.assert_allclose(
            np.asarray(mean_o), mean_r.numpy(), atol=1e-5, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(Lz_o), Lz_r.numpy(), atol=1e-5, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(inv_o), inv_r.numpy(), atol=2e-4, rtol=2e-3
        )


def test_priormix_three_sources_inv_parity(ref_sdes_mod, rng):
    """ndim > 2 takes the reference's torch.linalg.solve branch
    (sdes.py:548-553) — ours must match there too."""
    args = dict(PRIORMIX, ndim=3)
    from diffsep_tpu.sde import PriorMixSDE

    ref = ref_sdes_mod.PriorMixSDE(**args)
    ours = PriorMixSDE(**args)
    x0 = _rand(rng, 2, 3, 120) * 0.5
    mix = x0.sum(axis=1, keepdims=True)
    z = _rand(rng, 2, 3, 120)
    t = np.full((2,), 0.6, np.float32)
    L_r = ref.marginal_prob(
        torch.from_numpy(x0), torch.from_numpy(t), torch.from_numpy(mix)
    )[1]
    inv_r = ref.mult_std_inv(L_r, torch.from_numpy(z))
    L_o = ours.marginal_prob(jnp.asarray(x0), jnp.asarray(t),
                             jnp.asarray(mix))[1]
    inv_o = ours.mult_std_inv(L_o, jnp.asarray(z))
    np.testing.assert_allclose(
        np.asarray(inv_o), inv_r.numpy(), atol=2e-4, rtol=2e-3
    )


def test_priormix_prior_mean_parity(ref_sdes_mod, rng, monkeypatch):
    """Zero-noise prior (mean part) for both accepted mix widths: 1-channel
    (broadcast mix/2) and n-channel (pass-through) — sdes.py:564-587."""
    from diffsep_tpu.sde import PriorMixSDE

    monkeypatch.setattr(torch, "randn_like",
                        lambda x: torch.zeros_like(x))
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype),
    )
    ref = ref_sdes_mod.PriorMixSDE(**PRIORMIX)
    ours = PriorMixSDE(**PRIORMIX)
    for width in (1, 2):
        mix = _rand(rng, 2, width, 150) * 0.5
        xr = ref.prior_sampling(None, torch.from_numpy(mix)).numpy()
        xo = np.asarray(
            ours.prior_sampling(jax.random.PRNGKey(0), jnp.asarray(mix))
        )
        np.testing.assert_allclose(xo, xr, atol=1e-6)


OUVE = dict(theta=1.5, sigma_min=0.05, sigma_max=0.5, N=25)
OUVP = dict(beta_min=0.1, beta_max=20.0, stiffness=1.5, N=25)


@pytest.mark.parametrize("which", ["ouve", "ouvp"])
def test_ou_sde_parity(ref_sdes_mod, rng, which):
    """OUVESDE / OUVPSDE drift, diffusion, marginal mean/std, and the
    Euler-Maruyama discretization (sdes.py:593-780 + base discretize)."""
    if which == "ouve":
        ref = ref_sdes_mod.OUVESDE(**OUVE)
        from diffsep_tpu.sde import OUVESDE as Ours

        ours = Ours(**OUVE)
    else:
        ref = ref_sdes_mod.OUVPSDE(**OUVP)
        from diffsep_tpu.sde import OUVPSDE as Ours

        ours = Ours(**OUVP)

    # the reference's OU classes hard-code the 4-D (b, c, h, w) layout of
    # the SGMSE spectrogram domain ([:, None, None, None] broadcasts,
    # sdes.py:660,688); ours broadcast by rank, so 4-D exercises both
    x = _rand(rng, 3, 2, 4, 20) * 0.5
    y = _rand(rng, 3, 2, 4, 20) * 0.5
    for tval in [0.05, 0.5, 1.0]:
        t = np.full((3,), tval, np.float32)
        xt, tt, yt = map(torch.from_numpy, (x, t, y))
        f_r, g_r = ref.sde(xt, tt, yt)
        mean_r, std_r = ref.marginal_prob(xt, tt, yt)
        f_o, g_o = ours.sde(jnp.asarray(x), jnp.asarray(t), jnp.asarray(y))
        mean_o, std_o = ours.marginal_prob(
            jnp.asarray(x), jnp.asarray(t), jnp.asarray(y)
        )
        np.testing.assert_allclose(np.asarray(f_o), f_r.numpy(),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(
            np.broadcast_to(np.asarray(g_o), g_r.shape), g_r.numpy(),
            atol=1e-6, rtol=1e-6,
        )
        np.testing.assert_allclose(np.asarray(mean_o), mean_r.numpy(),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(
            np.broadcast_to(np.asarray(std_o), std_r.shape), std_r.numpy(),
            atol=1e-6, rtol=1e-5,
        )

        # base-class EM discretization f = drift*dt, G = diffusion*sqrt(dt)
        fd_r, gd_r = ref.discretize(xt, tt, yt)
        fd_o, gd_o = ours.discretize(jnp.asarray(x), jnp.asarray(t),
                                     jnp.asarray(y))
        np.testing.assert_allclose(np.asarray(fd_o), fd_r.numpy(),
                                   atol=1e-6, rtol=1e-5)
        np.testing.assert_allclose(
            np.broadcast_to(np.asarray(gd_o), gd_r.shape), gd_r.numpy(),
            atol=1e-6, rtol=1e-5,
        )


@pytest.mark.parametrize("which", ["mix", "priormix"])
def test_varprop_distribution_matches_reference_sampler(ref_sdes_mod, which):
    """Our inverse-CDF varprop time sampler draws from the SAME distribution
    as the reference's rejection sampler (sdes.py:259-273): two-sample
    empirical-CDF max distance well under the n=30k KS noise band x2."""
    n = 30000
    t_eps = 0.03
    if which == "mix":
        ref = ref_sdes_mod.MixSDE(ndim=2, d_lambda=2.0, sigma_min=0.05,
                                  sigma_max=0.5, N=30)
        from diffsep_tpu.sde import MixSDE

        ours = MixSDE(ndim=2, d_lambda=2.0, sigma_min=0.05, sigma_max=0.5,
                      N=30)
    else:
        ref = ref_sdes_mod.PriorMixSDE(**PRIORMIX)
        from diffsep_tpu.sde import PriorMixSDE

        ours = PriorMixSDE(**PRIORMIX)

    torch.manual_seed(0)
    t_ref = np.sort(ref.sample_time_varprop(n, t_eps=t_eps).numpy())
    t_our = np.sort(
        np.asarray(ours.sample_time_varprop(jax.random.PRNGKey(0), n,
                                            t_eps=t_eps))
    )
    assert t_our.min() >= t_eps - 1e-6 and t_our.max() <= 1.0 + 1e-6
    # two-sample KS statistic
    grid = np.linspace(t_eps, 1.0, 512)
    cdf_ref = np.searchsorted(t_ref, grid) / n
    cdf_our = np.searchsorted(t_our, grid) / n
    ks = np.abs(cdf_ref - cdf_our).max()
    assert ks < 0.025, f"varprop distribution mismatch: KS={ks:.4f}"
