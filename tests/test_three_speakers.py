"""3-speaker support (the reference supports n_spkr in {2, 3},
wsj0_mix.py:49-52): SDE closed forms, PIT losses over 3! permutations,
training step and separation must all work at ndim=3."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsep_tpu.config import compose
from diffsep_tpu.model import DiffSepModel
from diffsep_tpu.sde import MixSDE
from diffsep_tpu.train import losses as TL


def test_mixsde_ndim3_properties(rng):
    sde = MixSDE(ndim=3)
    x = jnp.asarray(rng.standard_normal((2, 3, 16)).astype(np.float32))
    cond = x.sum(1, keepdims=True)
    t = jnp.asarray([0.4, 0.9])
    mean, L = sde.marginal_prob(x, t, cond)
    assert mean.shape == x.shape and L.shape == (2, 3, 3)
    y = sde.mult_std_inv(L, sde.mult_std(L, x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-3, atol=1e-4)
    xt = sde.prior_sampling(jax.random.PRNGKey(0), cond)
    assert xt.shape == (2, 3, 16)


def test_pit_losses_three_speakers(rng):
    sde = MixSDE(ndim=3)
    target = jnp.asarray(rng.standard_normal((2, 3, 32)).astype(np.float32))
    mix = target.sum(1, keepdims=True)
    fake = lambda x, t, m: -0.5 * x
    for fn in [
        TL.compute_score_loss_with_pit,
        TL.compute_score_loss_with_pit_allthetime,
    ]:
        loss = fn(jax.random.PRNGKey(0), sde, fake, mix, target, t_eps=0.03)
        assert loss.shape == (2,) and np.isfinite(np.asarray(loss)).all()
    loss = TL.compute_score_loss_init_hack_pit(
        jax.random.PRNGKey(1), sde, fake, mix, target
    )
    assert loss.shape == (2,) and np.isfinite(np.asarray(loss)).all()


def test_exact_transition_samplers_three_speakers(rng):
    """ddim and dpmpp rely only on the {A, Pn} projector eigenstructure,
    which holds for any ndim — both must recover 3 sources from the
    analytic score."""
    from diffsep_tpu.sampling import pc_sample

    n = 96
    k = np.arange(n)
    x0 = jnp.asarray(
        np.stack(
            [
                np.sin(2 * np.pi * 3 * k / n),
                0.7 * np.cos(2 * np.pi * 6 * k / n),
                0.5 * np.sin(2 * np.pi * 9 * k / n),
            ]
        )[None].astype(np.float32)
    )
    mix = x0.sum(axis=1, keepdims=True)
    sde = MixSDE(ndim=3, N=6)

    def score(x, t, cond):
        mean, L = sde.marginal_prob(x0, t, cond)
        return -sde.mult_std_inv(L, sde.mult_std_inv(L, x - mean))

    for pred in ("ddim", "dpmpp"):
        x, _ = pc_sample(
            jax.random.PRNGKey(0), sde, score, mix,
            predictor_name=pred, corrector_name="none",
        )
        err = float(jnp.abs(x - x0).mean())
        assert err < 1e-2, (pred, err)


def test_three_speaker_model_end_to_end(rng):
    cfg = compose(
        [
            "model.n_speakers=3",
            "model.score_model.backbone_args.nf=8",
            "model.score_model.backbone_args.ch_mult=[1,2]",
            "model.score_model.backbone_args.num_res_blocks=1",
            "model.score_model.backbone_args.image_size=64",
            "model.score_model.stft_args.n_fft=126",
            "model.score_model.stft_args.hop_length=32",
            "model.init_hack=5",
            "model.init_hack_p=0.5",
            "trainer.accumulate_grad_batches=1",
        ]
    )
    model = DiffSepModel(cfg)
    assert model.sde.ndim == 3
    # backbone channels inferred: in = 2*3+2, out = 2*3
    assert model.score_model.backbone.num_channels_in == 8
    assert model.score_model.backbone.num_channels_out == 6

    target = jnp.asarray(rng.standard_normal((2, 3, 512)).astype(np.float32))
    mix = target.sum(1, keepdims=True)
    state = model.init_state(jax.random.PRNGKey(0), mix, target)
    step = jax.jit(model.make_train_step(jax.random.PRNGKey(1)))
    state, metrics = step(state, mix, target)
    assert np.isfinite(float(metrics["train/score_loss"]))

    est, nfe = model.separate(state.params, jax.random.PRNGKey(2), mix, N=2)
    assert est.shape == (2, 3, 512)
    assert np.isfinite(np.asarray(est)).all()
