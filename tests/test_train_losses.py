"""Training-loss tests.

The single-forward PIT losses must compute exactly the same values as the
reference's multi-forward formulation (pl_model.py:249-405). The reference
math is transcribed here in its original multi-forward form and fed the same
random draws (reproduced white-box from the key-split order), with a
deterministic fake network.
"""
import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsep_tpu.sde import MixSDE
from diffsep_tpu.train import losses as TL


def fake_score(x_t, t, mix):
    """Deterministic nonlinear 'network' for equivalence tests."""
    return -0.5 * x_t + 0.2 * jnp.tanh(x_t) + 0.1 * jnp.broadcast_to(mix, x_t.shape)


@pytest.fixture
def batch(rng):
    b, n, s = 4, 2, 64
    target = jnp.asarray(rng.standard_normal((b, n, s)).astype(np.float32))
    mix = target.sum(axis=1, keepdims=True)
    return mix, target


def test_normalize_batch_matches_torch(rng):
    import torch

    mix = rng.standard_normal((3, 1, 50)).astype(np.float32)
    tgt = rng.standard_normal((3, 2, 50)).astype(np.float32)
    (m, t), mean, std = TL.normalize_batch(jnp.asarray(mix), jnp.asarray(tgt))
    tm = torch.from_numpy(mix)
    ref_mean = tm.mean(dim=(1, 2), keepdim=True)
    ref_std = tm.std(dim=(1, 2), keepdim=True).clamp(min=1e-5)
    np.testing.assert_allclose(np.asarray(mean), ref_mean.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(std), ref_std.numpy(), rtol=1e-5)
    back = TL.denormalize_batch(t, mean, std)
    np.testing.assert_allclose(np.asarray(back), tgt, atol=1e-5)


def test_shuffle_sources_permutes(rng):
    x = jnp.asarray(rng.standard_normal((8, 3, 10)).astype(np.float32))
    y = TL.shuffle_sources(jax.random.PRNGKey(0), x)
    # per batch entry the set of rows is preserved
    for b in range(8):
        sx = {tuple(np.round(r, 5)) for r in np.asarray(x)[b]}
        sy = {tuple(np.round(r, 5)) for r in np.asarray(y)[b]}
        assert sx == sy


def test_power_order_sources(rng):
    x = jnp.asarray(rng.standard_normal((4, 3, 100)).astype(np.float32))
    y = np.asarray(TL.power_order_sources(x))
    v = y.var(axis=-1)
    assert (np.diff(v, axis=1) >= -1e-6).all()


def test_init_hack_pit_input_is_perm_independent(batch):
    """The algebraic identity justifying the single forward:
    mean_p + L (z0 + L^{-1}(mix/n - mean_p)) == mix/n + L z0 for all perms."""
    mix, target = batch
    sde = MixSDE(ndim=2)
    time = jnp.full((mix.shape[0],), sde.T)
    z0 = jax.random.normal(jax.random.PRNGKey(1), target.shape)
    true_mix = jnp.broadcast_to(mix, target.shape) / target.shape[1]
    ref = true_mix + sde.mult_std(sde.marginal_prob(target, time, mix)[1], z0)
    for p in itertools.permutations(range(2)):
        mean, L = sde.marginal_prob(target[:, p, :], time, mix)
        z = z0 + sde.mult_std_inv(L, true_mix - mean)
        x_t = mean + sde.mult_std(L, z)
        np.testing.assert_allclose(np.asarray(x_t), np.asarray(ref), atol=1e-4)


def test_init_hack_pit_matches_multiforward(batch):
    """Our 1-forward loss == the reference's n_perm-forward formulation
    (pl_model.py:370-405) given the same z0."""
    mix, target = batch
    sde = MixSDE(ndim=2)
    key = jax.random.PRNGKey(2)
    ours = TL.compute_score_loss_init_hack_pit(key, sde, fake_score, mix, target)

    # reference transcription (multi-forward)
    time = jnp.full((mix.shape[0],), sde.T)
    true_mix = jnp.broadcast_to(mix, target.shape) / target.shape[1]
    z0 = jax.random.normal(key, target.shape)  # same draw as inside
    losses = []
    for p in itertools.permutations(range(2)):
        mean, L = sde.marginal_prob(target[:, p, :], time, mix)
        z = z0 + sde.mult_std_inv(L, true_mix - mean)
        x_t = mean + sde.mult_std(L, z)
        pred = fake_score(x_t, time, mix)
        losses.append(
            ((sde.mult_std(L, pred) + z) ** 2).mean(axis=(-2, -1))
        )
    ref = jnp.stack(losses, axis=1).min(axis=1)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4)


def test_pit_allthetime_matches_multiforward(batch):
    mix, target = batch
    sde = MixSDE(ndim=2)
    key = jax.random.PRNGKey(3)
    ours = TL.compute_score_loss_with_pit_allthetime(
        key, sde, fake_score, mix, target, t_eps=0.03
    )

    # reproduce internal draws (kt, kz, ksh order)
    kt, kz, ksh = jax.random.split(key, 3)
    tgt = TL.shuffle_sources(ksh, target)
    time = jax.random.uniform(kt, (mix.shape[0],), minval=0.03, maxval=sde.T)
    mean_0, L = sde.marginal_prob(tgt, time, mix)
    z0 = jax.random.normal(kz, target.shape)
    x_t = mean_0 + sde.mult_std(L, z0)
    losses = []
    for p in itertools.permutations(range(2)):
        mean_p = sde.marginal_prob(tgt[:, p, :], time, mix)[0]
        z_p = z0 + sde.mult_std_inv(L, mean_0 - mean_p)
        pred = fake_score(x_t, time, mix)  # reference re-evaluates per perm
        losses.append(((sde.mult_std(L, pred) + z_p) ** 2).mean(axis=(-2, -1)))
    ref = jnp.stack(losses, axis=0).min(axis=0)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4)


def test_pit_mmnr_gate_matches_multiforward(batch):
    mix, target = batch
    sde = MixSDE(ndim=2)
    key = jax.random.PRNGKey(4)
    thresh = -10.0
    ours = TL.compute_score_loss_with_pit(
        key, sde, fake_score, mix, target, t_eps=0.03, mmnr_thresh_pit=thresh
    )

    kt, kz, ks = jax.random.split(key, 3)
    time = jax.random.uniform(kt, (mix.shape[0],), minval=0.03, maxval=sde.T)
    perms = list(itertools.permutations(range(2)))
    means = jnp.stack(
        [sde.marginal_prob(target[:, p, :], time, mix)[0] for p in perms], axis=1
    )
    L = sde.marginal_prob(target, time, mix)[1]
    z = jax.random.normal(kz, target.shape)
    Lz = sde.mult_std(L, z)
    sel = jax.random.randint(ks, (target.shape[0],), 0, len(perms))
    mean_select = jnp.take_along_axis(means, sel[:, None, None, None], axis=1)[:, 0]
    x_t = mean_select + Lz
    err = means - mean_select[:, None]
    n_elems = (len(perms) - 1) * means.shape[2] * means.shape[3]
    mmnr = 10 * jnp.log10(
        (err**2).sum(axis=(1, 2, 3)) / n_elems
        / jnp.clip((Lz**2).mean(axis=(1, 2)), 1e-5)
    )
    pred = fake_score(x_t, time, mix)
    loss_reg = ((sde.mult_std(L, pred) + z) ** 2).mean(axis=(-2, -1))
    l_pit = []
    for i in range(len(perms)):
        z_p = z + sde.mult_std_inv(L, err[:, i])
        l_pit.append(((sde.mult_std(L, pred) + z_p) ** 2).mean(axis=(-2, -1)))
    ref = jnp.where(mmnr < thresh, jnp.stack(l_pit, -1).min(-1), loss_reg)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4)


@pytest.mark.parametrize("init_hack", [False, 1, 2, 3, 4, 5, 6, 7])
def test_training_loss_dispatch_finite(batch, init_hack):
    mix, target = batch
    sde = MixSDE(ndim=2)
    loss = TL.training_loss(
        jax.random.PRNGKey(5),
        sde,
        fake_score,
        mix,
        target,
        t_eps=0.03,
        init_hack=init_hack,
        init_hack_p=0.5,
    )
    assert np.isfinite(float(loss))


@pytest.mark.parametrize("order", ["random", "power", "pit"])
def test_training_loss_source_orders(batch, order):
    mix, target = batch
    sde = MixSDE(ndim=2)
    loss = TL.training_loss(
        jax.random.PRNGKey(6), sde, fake_score, mix, target,
        t_eps=0.03, train_source_order=order,
    )
    assert np.isfinite(float(loss))


def test_training_loss_jits(batch):
    mix, target = batch
    sde = MixSDE(ndim=2)
    f = jax.jit(
        lambda k: TL.training_loss(
            k, sde, fake_score, mix, target, t_eps=0.03, init_hack=5,
            init_hack_p=0.1,
        )
    )
    assert np.isfinite(float(f(jax.random.PRNGKey(7))))


def test_sample_weight_all_ones_equals_unweighted(batch):
    mix, target = batch
    sde = MixSDE(ndim=2)
    kw = dict(t_eps=0.03, init_hack=5, init_hack_p=0.5)
    a = TL.training_loss(jax.random.PRNGKey(7), sde, fake_score, mix, target, **kw)
    b = TL.training_loss(
        jax.random.PRNGKey(7), sde, fake_score, mix, target,
        sample_weight=jnp.ones(mix.shape[0]), **kw,
    )
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_zero_weighted_filler_content_is_irrelevant(batch):
    """Batch padding contract (train/loop.py:pad_batch_for_tpu): the
    CONTENT of zero-weighted samples must not change the loss."""
    mix, target = batch
    sde = MixSDE(ndim=2)
    kw = dict(t_eps=0.03, init_hack=5, init_hack_p=0.5)
    w = jnp.array([1.0] * (mix.shape[0] - 1) + [0.0])
    a = TL.training_loss(
        jax.random.PRNGKey(8), sde, fake_score, mix, target,
        sample_weight=w, **kw,
    )
    mix2 = mix.at[-1].set(mix[0] * 3.0 + 0.1)
    tgt2 = target.at[-1].set(target[0] * -2.0)
    b = TL.training_loss(
        jax.random.PRNGKey(8), sde, fake_score, mix2, tgt2,
        sample_weight=w, **kw,
    )
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_pad_batch_for_tpu():
    from diffsep_tpu.train.loop import pad_batch_for_tpu

    rng = np.random.default_rng(0)
    mix = rng.standard_normal((6, 1, 64)).astype(np.float32)
    tgt = rng.standard_normal((6, 2, 64)).astype(np.float32)
    m, t, w = pad_batch_for_tpu(mix, tgt, multiple=8)
    assert m.shape[0] == t.shape[0] == len(w) == 8
    np.testing.assert_array_equal(m[:6], mix)
    np.testing.assert_array_equal(m[6], mix[0])
    np.testing.assert_array_equal(m[7], mix[1])
    np.testing.assert_array_equal(w, [1, 1, 1, 1, 1, 1, 0, 0])
    # already-aligned batches pass through untouched
    m2, t2, w2 = pad_batch_for_tpu(mix[:4], tgt[:4], multiple=4)
    assert m2.shape[0] == 4 and (w2 == 1).all()


def test_normalize_batch_masked_full_length_reduces_to_unmasked():
    rng = np.random.default_rng(5)
    mix = jnp.asarray(rng.standard_normal((3, 1, 64)).astype(np.float32))
    n_valid = jnp.full((3,), 64, jnp.int32)
    got, mean_m, std_m = TL.normalize_batch_masked(mix, n_valid)
    (want, _), mean, std = TL.normalize_batch(mix, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mean_m), np.asarray(mean), atol=1e-7)
    np.testing.assert_allclose(np.asarray(std_m), np.asarray(std), atol=1e-7)


def test_normalize_batch_masked_matches_serve_host_rule():
    """Masked stats over the true span must equal the serving host path:
    normalize each row on its unpadded length, THEN zero-pad
    (cli/serve.py:_normalize_rows) — per-row, with mixed lengths."""
    from diffsep_tpu.cli.serve import _normalize_rows

    rng = np.random.default_rng(6)
    lens = [40, 64, 17]
    padded = 64
    wavs = [
        (rng.standard_normal((1, L)) * 0.1 + 0.03).astype(np.float32)
        for L in lens
    ]
    rows, means, stds = _normalize_rows(wavs, padded)
    mix = jnp.asarray(
        np.stack(
            [np.pad(w, ((0, 0), (0, padded - w.shape[-1]))) for w in wavs]
        )
    )
    got, mean_m, std_m = TL.normalize_batch_masked(
        mix, jnp.asarray(lens, jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(got), np.stack(rows), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mean_m).ravel(), np.asarray(means), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(std_m).ravel(), np.asarray(stds), atol=1e-6
    )
    # pad region of the normalized output is exactly zero
    assert np.all(np.asarray(got)[0, :, 40:] == 0)
    assert np.all(np.asarray(got)[2, :, 17:] == 0)


def test_normalize_batch_masked_clamps_degenerate_n_valid():
    """n_valid=0 must not produce NaN (0/0 mean) and over-length counts
    must not deflate the std — both clamp to [1, n_samples]."""
    rng = np.random.default_rng(7)
    mix = jnp.asarray(rng.standard_normal((2, 1, 32)).astype(np.float32))
    got, mean, std = TL.normalize_batch_masked(
        mix, jnp.asarray([0, 999], jnp.int32)
    )
    assert np.isfinite(np.asarray(got)).all()
    assert np.isfinite(np.asarray(mean)).all()
    # row 1 clamps to the full length -> equals unmasked stats
    (_, _), mean_u, std_u = TL.normalize_batch(mix[1:], None)
    np.testing.assert_allclose(
        float(np.asarray(std)[1].squeeze()),
        float(np.asarray(std_u).squeeze()), atol=1e-6,
    )
