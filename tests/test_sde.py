"""SDE library tests.

The reference ships no tests for its SDE closed forms (SURVEY.md §4); here
the marginal mean/covariance formulas are validated *independently* by
Euler–Maruyama simulation of the forward SDE, and the std-operator algebra
is checked as exact inverses (mult_std_inv ∘ mult_std = id, the property
target named in SURVEY.md §4).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsep_tpu.sde import MixSDE, OUVESDE, OUVPSDE, PriorMixSDE, SDERegistry


def test_registry():
    for name in ["mix", "priormix", "ouve", "ouvp"]:
        assert name in SDERegistry


@pytest.mark.parametrize("ndim", [2, 3])
def test_mix_mult_std_inverse(rng, ndim):
    sde = MixSDE(ndim=ndim)
    t = jnp.asarray(rng.uniform(0.1, 1.0, (4,)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((4, ndim, 16)).astype(np.float32))
    L = sde._std(t)
    y = sde.mult_std_inv(L, sde.mult_std(L, x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("ndim", [2, 3])
def test_priormix_mult_std_inverse(rng, ndim):
    sde = PriorMixSDE(ndim=ndim, avg_len=8)
    t = jnp.asarray(rng.uniform(0.1, 1.0, (3,)).astype(np.float32))
    mix = jnp.asarray(rng.standard_normal((3, 1, 32)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((3, ndim, 32)).astype(np.float32))
    L = sde._std(t, mix)
    y = sde.mult_std_inv(L, sde.mult_std(L, x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-3, atol=1e-4)


def test_priormix_envelope_matches_torch_avgpool(rng):
    """Envelope == torch avg_pool1d(mix^2, k, stride 1, pad k//2) semantics
    (sdes/sdes.py:477-489)."""
    import torch
    import torch.nn.functional as F

    for k in [8, 9, 510]:
        mix = rng.standard_normal((2, 1, 1200)).astype(np.float32)
        sde = PriorMixSDE(avg_len=k)
        ours = np.asarray(sde._std_sigma_mix(jnp.asarray(mix)))
        ref = F.avg_pool1d(
            torch.from_numpy(mix) ** 2, kernel_size=k, stride=1, padding=k // 2
        )
        ref = ref.clamp(min=1e-4).sqrt()
        if k % 2 == 0:
            ref = ref[..., :-1]
        ref = 0.5 * ref.numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_mix_marginal_matches_simulation(rng):
    """Euler–Maruyama simulation of the forward SDE vs the closed-form
    marginal mean and covariance eigenvalues at t = T."""
    sde = MixSDE(ndim=2, d_lambda=2.0, sigma_min=0.05, sigma_max=0.5)
    n_paths, n_steps = 4000, 400
    x0 = np.array([1.0, -0.5], np.float32)
    x = jnp.broadcast_to(jnp.asarray(x0)[None, :, None], (n_paths, 2, 1))
    dt = sde.T / n_steps
    key = jax.random.PRNGKey(0)
    cond = x.sum(axis=1, keepdims=True)

    # simple host loop (tiny problem), but each step is jitted
    @jax.jit
    def em_step(x, t_and_key):
        t, key = t_and_key
        drift, diff = sde.sde(x, jnp.full((n_paths,), t), cond)
        z = jax.random.normal(key, x.shape)
        return x + drift * dt + diff[:, None, None] * np.sqrt(dt) * z

    ts = np.linspace(0, sde.T, n_steps, endpoint=False)
    keys = jax.random.split(key, n_steps)
    for t, k in zip(ts, keys):
        x = em_step(x, (jnp.float32(t), k))

    xs = np.asarray(x)[:, :, 0]
    # closed-form mean / std at t = T
    tT = jnp.ones((1,), jnp.float32)
    mean = np.asarray(
        sde.marginal_prob(jnp.asarray(x0)[None, :, None], tT, cond[:1])[0]
    )[0, :, 0]
    ev1, ev2 = sde._cov_eigval(tT)
    np.testing.assert_allclose(xs.mean(0), mean, atol=0.02)
    # covariance eigen-decomposition in the (sum, diff)/sqrt2 basis
    s = (xs[:, 0] + xs[:, 1]) / np.sqrt(2)
    d = (xs[:, 0] - xs[:, 1]) / np.sqrt(2)
    np.testing.assert_allclose(s.var(), float(ev1[0]), rtol=0.12)
    np.testing.assert_allclose(d.var(), float(ev2[0]), rtol=0.12)


def test_mix_prior_sampling_stats(rng):
    sde = MixSDE(ndim=2)
    mix = jnp.asarray(rng.standard_normal((1, 1, 8)).astype(np.float32))
    key = jax.random.PRNGKey(1)
    xs = jax.vmap(lambda k: sde.prior_sampling(k, mix))(jax.random.split(key, 3000))
    m = np.asarray(xs.mean(axis=0))
    np.testing.assert_allclose(m, np.asarray(mix / 2) * np.ones((1, 2, 1)), atol=0.05)


def test_mix_marginal_at_t0(rng):
    sde = MixSDE(ndim=2)
    x0 = jnp.asarray(rng.standard_normal((2, 2, 8)).astype(np.float32))
    cond = x0.sum(axis=1, keepdims=True)
    mean, L = sde.marginal_prob(x0, jnp.zeros((2,)), cond)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(x0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(L), 0.0, atol=1e-4)


def test_varprop_time_sampler_density():
    sde = MixSDE(ndim=2)
    key = jax.random.PRNGKey(2)
    t = np.asarray(sde.sample_time_varprop(key, 20000, t_eps=0.03))
    assert t.min() >= 0.03 and t.max() <= 1.0
    # density should increase with t (std is increasing): later half more mass
    assert (t > 0.6).mean() > (t < 0.4).mean()


def test_ouve_marginal_matches_simulation(rng):
    sde = OUVESDE(theta=1.5, sigma_min=0.05, sigma_max=0.5)
    n_paths, n_steps = 4000, 400
    x = jnp.full((n_paths, 1, 1), 1.0)
    y = jnp.full((n_paths, 1, 1), -0.3)
    dt = sde.T / n_steps

    @jax.jit
    def em_step(x, t_and_key):
        t, key = t_and_key
        drift, diff = sde.sde(x, jnp.full((n_paths,), t), y)
        z = jax.random.normal(key, x.shape)
        return x + drift * dt + diff[:, None, None] * np.sqrt(dt) * z

    ts = np.linspace(0, sde.T, n_steps, endpoint=False)
    for t, k in zip(ts, jax.random.split(jax.random.PRNGKey(3), n_steps)):
        x = em_step(x, (jnp.float32(t), k))
    xs = np.asarray(x).ravel()
    tT = jnp.ones((1,), jnp.float32)
    mean = np.asarray(sde._mean(jnp.full((1, 1, 1), 1.0), tT, y[:1])).ravel()
    std = float(sde._std(tT)[0])
    np.testing.assert_allclose(xs.mean(), mean, atol=0.02)
    np.testing.assert_allclose(xs.std(), std, rtol=0.1)


def test_ouvp_shapes(rng):
    sde = OUVPSDE(beta_min=0.01, beta_max=1.0)
    x = jnp.asarray(rng.standard_normal((2, 1, 8)).astype(np.float32))
    y = jnp.zeros_like(x)
    mean, std = sde.marginal_prob(x, jnp.full((2,), 0.5), y)
    assert mean.shape == x.shape and std.shape == (2,)
    xt = sde.prior_sampling(jax.random.PRNGKey(0), y)
    assert xt.shape == x.shape


def test_discretize_dt(rng):
    """discretize honors an explicit dt (used by the scheduled sampler)."""
    sde = MixSDE(ndim=2, N=30)
    x = jnp.asarray(rng.standard_normal((1, 2, 4)).astype(np.float32))
    cond = x.sum(1, keepdims=True)
    t = jnp.full((1,), 0.5)
    f1, G1 = sde.discretize(x, t, cond)
    f2, G2 = sde.discretize(x, t, cond, dt=2.0 / 30)
    np.testing.assert_allclose(np.asarray(f2), 2 * np.asarray(f1), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(G2), np.sqrt(2.0) * np.asarray(G1), rtol=1e-5
    )
