"""Full-pipeline numerical parity against the ACTUAL reference code run
in-process.

The backbone is already pinned against /root/reference/models/ncsnpp.py
(test_ncsnpp.py) and the STFT against torch.stft (test_stft.py) — but
composition errors (pre/post-process padding, the magnitude-compression
transform, real/imag packing, SDE discretization, corrector algebra) could
still slip between individually-correct pieces.  These tests run the
reference's COMPOSED pipeline — models/score_models.py ScoreModelNCSNpp
(STFT -> transform -> backbone -> iSTFT) and sdes/{sdes,predictors,
correctors}.py — on CPU with the same (converted) weights and compare the
deterministic parts step for step:

  * full time-domain score model forward         (score_models.py:126-138)
  * MixSDE marginal_prob mean + std operator     (sdes.py:286-332)
  * reverse_diffusion predictor x_mean           (predictors.py:55-66)
  * ald2 corrector x_mean                        (correctors.py:94-128)

torchaudio and hydra are not installed in this image; the reference only
uses torchaudio.transforms.{Spectrogram,InverseSpectrogram}, which are thin
wrappers over torch.stft/istft (the exact oracle test_stft.py pins), and
hydra.utils.instantiate on a plain dict — both stubbed faithfully below.
"""
import sys
import types
from pathlib import Path

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REF / "models/score_models.py").exists(),
    reason="reference checkout not available",
)


def _install_torchaudio_stub():
    """Minimal torchaudio.transforms on top of torch.stft/istft — the same
    ops torchaudio's own Spectrogram/InverseSpectrogram dispatch to."""
    if "torchaudio" in sys.modules:
        return

    class Spectrogram(torch.nn.Module):
        def __init__(
            self,
            n_fft=400,
            win_length=None,
            hop_length=None,
            pad=0,
            window_fn=torch.hann_window,
            power=2.0,
            normalized=False,
            wkwargs=None,
            center=True,
            pad_mode="reflect",
            onesided=True,
        ):
            super().__init__()
            assert pad == 0 and not normalized, "stub: defaults only"
            self.n_fft = n_fft
            self.win_length = win_length if win_length is not None else n_fft
            self.hop_length = hop_length if hop_length is not None else n_fft // 2
            self.power = power
            self.center = center
            self.pad_mode = pad_mode
            self.onesided = onesided
            self.register_buffer("window", window_fn(self.win_length))

        def forward(self, x):
            shape = x.shape
            spec = torch.stft(
                x.reshape(-1, shape[-1]),
                n_fft=self.n_fft,
                hop_length=self.hop_length,
                win_length=self.win_length,
                window=self.window,
                center=self.center,
                pad_mode=self.pad_mode,
                normalized=False,
                onesided=self.onesided,
                return_complex=True,
            )
            if self.power is not None:
                spec = spec.abs() ** self.power
            return spec.reshape(shape[:-1] + spec.shape[-2:])

    class InverseSpectrogram(torch.nn.Module):
        def __init__(
            self,
            n_fft=400,
            win_length=None,
            hop_length=None,
            pad=0,
            window_fn=torch.hann_window,
            normalized=False,
            wkwargs=None,
            center=True,
            pad_mode="reflect",
            onesided=True,
        ):
            super().__init__()
            self.n_fft = n_fft
            self.win_length = win_length if win_length is not None else n_fft
            self.hop_length = hop_length if hop_length is not None else n_fft // 2
            self.center = center
            self.onesided = onesided
            self.register_buffer("window", window_fn(self.win_length))

        def forward(self, spec, length=None):
            shape = spec.shape
            x = torch.istft(
                spec.reshape(-1, *shape[-2:]),
                n_fft=self.n_fft,
                hop_length=self.hop_length,
                win_length=self.win_length,
                window=self.window,
                center=self.center,
                onesided=self.onesided,
                length=length,
            )
            return x.reshape(shape[:-2] + x.shape[-1:])

    ta = types.ModuleType("torchaudio")
    tr = types.ModuleType("torchaudio.transforms")
    tr.Spectrogram = Spectrogram
    tr.InverseSpectrogram = InverseSpectrogram
    ta.transforms = tr
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.transforms"] = tr


def _install_hydra_stub():
    """hydra.utils.instantiate for plain dicts with _target_ (the only use
    inside models/score_models.py)."""
    if "hydra" in sys.modules:
        return
    import importlib

    def instantiate(cfg, **kw):
        cfg = dict(cfg)
        target = cfg.pop("_target_")
        mod, _, name = target.rpartition(".")
        return getattr(importlib.import_module(mod), name)(**cfg, **kw)

    hy = types.ModuleType("hydra")
    hyu = types.ModuleType("hydra.utils")
    hyu.instantiate = instantiate
    hy.utils = hyu
    sys.modules["hydra"] = hy
    sys.modules["hydra.utils"] = hyu


BACKBONE = dict(
    nf=8,
    ch_mult=[1, 2],
    num_res_blocks=1,
    attn_resolutions=[16],
    image_size=64,
)
STFT_ARGS = {"n_fft": 126, "hop_length": 32, "center": True,
             "pad_mode": "constant"}
SDE_ARGS = dict(ndim=2, d_lambda=2.0, sigma_min=0.05, sigma_max=0.5, N=4)


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    """(reference ScoreModelNCSNpp in torch, our DiffSepModel + params with
    the converted weights)."""
    sys.path.insert(0, str(REF))
    try:
        from tests.test_ncsnpp import _install_reference_op_stub

        _install_reference_op_stub()
        _install_torchaudio_stub()
        _install_hydra_stub()
        from models.score_models import ScoreModelNCSNpp as TorchScoreModel
    finally:
        sys.path.remove(str(REF))

    torch.manual_seed(0)
    tm = TorchScoreModel(
        num_sources=2,
        stft_args=dict(STFT_ARGS),
        backbone_args={"_target_": "models.ncsnpp.NCSNpp", **BACKBONE},
        transform="exponent",
        spec_abs_exponent=0.5,
        spec_factor=0.33,
        spec_trans_learnable=False,
    )
    tm.eval()

    # reference-layout checkpoint -> our loader (EMA shadow == raw weights
    # so both sides evaluate identical parameters)
    state_dict = {
        f"score_model.{k}": v for k, v in tm.state_dict().items()
    }
    shadow = [p.detach().clone() for p in tm.parameters() if p.requires_grad]
    ckpt = {
        "state_dict": state_dict,
        "ema": {"decay": 0.999, "num_updates": 10, "shadow_params": shadow},
        "hyper_parameters": {
            "config": {
                "model": {
                    "n_speakers": 2,
                    "fs": 8000,
                    "t_eps": 0.03,
                    "ema_decay": 0.999,
                    "score_model": {
                        "_target_": "models.score_models.ScoreModelNCSNpp",
                        "num_sources": 2,
                        "stft_args": dict(STFT_ARGS),
                        "backbone_args": {
                            "_target_": "models.ncsnpp.NCSNpp",
                            **BACKBONE,
                        },
                        "transform": "exponent",
                        "spec_abs_exponent": 0.5,
                        "spec_factor": 0.33,
                        "spec_trans_learnable": False,
                    },
                    "sde": {
                        "_target_": "sdes.sdes.MixSDE", **SDE_ARGS,
                    },
                    "sampler": {"N": 4, "snr": 0.5, "corrector_steps": 1},
                    "optimizer": {"_target_": "torch.optim.Adam", "lr": 1e-4},
                    "grad_clipper": {
                        "_target_": "utils.FixedClipper", "max_norm": 5.0,
                    },
                },
                "trainer": {"accumulate_grad_batches": 1},
                "datamodule": {},
            }
        },
    }
    path = tmp_path_factory.mktemp("ckpt") / "checkpoint.pt"
    torch.save(ckpt, path)

    from diffsep_tpu.cli.loading import load_model

    model, params = load_model(path)
    return tm, model, params


def _install_pl_stub():
    """The reference's utils package imports pytorch_lightning at module
    scope (checkpoint_symlink.py:5) but sdes/ never touches it at import
    time — a bare module satisfies the import."""
    if "pytorch_lightning" not in sys.modules:
        sys.modules["pytorch_lightning"] = types.ModuleType(
            "pytorch_lightning"
        )


@pytest.fixture(scope="module")
def ref_sdes():
    _install_pl_stub()
    sys.path.insert(0, str(REF))
    try:
        import sdes.sdes as ref_sdes_mod
        import sdes.predictors as ref_pred_mod
        import sdes.correctors as ref_corr_mod
    finally:
        sys.path.remove(str(REF))
    return ref_sdes_mod, ref_pred_mod, ref_corr_mod


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


def test_full_score_model_forward(pair, rng):
    """The composed time-domain score (pad -> STFT -> transform -> c2r ->
    pad64 -> backbone -> unpad -> r2c -> inv transform -> iSTFT -> trim)
    matches the reference's composition on the same weights, at a length
    that exercises both frame-trim and frame-pad (score_models.py:83-124)."""
    tm, model, params = pair
    n = 1990  # not a multiple of hop, frames not a multiple of 64
    xt = _rand(rng, 1, 2, n) * 0.3
    mix = _rand(rng, 1, 1, n) * 0.3
    t = np.asarray([0.6], np.float32)

    with torch.no_grad():
        ref = tm(
            torch.from_numpy(xt), torch.from_numpy(t), torch.from_numpy(mix)
        ).numpy()
    ours = np.asarray(
        model.score_apply(
            params, jnp.asarray(xt), jnp.asarray(t), jnp.asarray(mix)
        )
    )
    assert ours.shape == ref.shape == (1, 2, n)
    scale = max(np.abs(ref).max(), 1e-3)
    np.testing.assert_allclose(ours, ref, atol=2e-3 * scale, rtol=2e-3)


def test_marginal_prob_parity(pair, ref_sdes, rng):
    """MixSDE closed-form marginal (mean-mix matrix + matrix-sqrt std
    operator) against the reference's sdes.py:286-332 on random vectors."""
    ref_sdes_mod, _, _ = ref_sdes
    _, model, _ = pair
    sde_ref = ref_sdes_mod.MixSDE(**SDE_ARGS)

    x0 = _rand(rng, 3, 2, 50)
    z = _rand(rng, 3, 2, 50)
    for tval in [0.05, 0.3, 0.7, 1.0]:
        t_np = np.full((3,), tval, np.float32)
        mean_r, L_r = sde_ref.marginal_prob(
            torch.from_numpy(x0), torch.from_numpy(t_np), None
        )
        Lz_r = sde_ref.mult_std(L_r, torch.from_numpy(z))
        mean_o, L_o = model.sde.marginal_prob(
            jnp.asarray(x0), jnp.asarray(t_np), None
        )
        Lz_o = model.sde.mult_std(L_o, jnp.asarray(z))
        np.testing.assert_allclose(
            np.asarray(mean_o), mean_r.numpy(), atol=1e-5, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(Lz_o), Lz_r.numpy(), atol=1e-5, rtol=1e-5
        )


def test_reverse_diffusion_predictor_step(pair, ref_sdes, rng):
    """Deterministic part (x_mean) of one reverse_diffusion predictor step
    through the FULL score network: pins SDE.discretize, the reverse drift
    rev_f = f - G^2 * score, and the score model itself in one shot
    (predictors.py:55-66, sdes.py:163-171)."""
    ref_sdes_mod, ref_pred_mod, _ = ref_sdes
    tm, model, params = pair

    sde_ref = ref_sdes_mod.MixSDE(**SDE_ARGS)
    pred_ref = ref_pred_mod.ReverseDiffusionPredictor(sde_ref, tm)

    n = 1984
    x = _rand(rng, 1, 2, n) * 0.3
    mix = _rand(rng, 1, 1, n) * 0.3

    from diffsep_tpu.sampling.predictors import ReverseDiffusionPredictor
    from diffsep_tpu.sde import MixSDE

    sde_o = MixSDE(**SDE_ARGS)
    pred_o = ReverseDiffusionPredictor(
        sde_o, lambda x_, t_, c_: model.score_apply(params, x_, t_, c_)
    )

    for tval in [0.2, 0.6, 1.0]:
        t_np = np.full((1,), tval, np.float32)
        with torch.no_grad():
            _, x_mean_ref = pred_ref.update_fn(
                torch.from_numpy(x), torch.from_numpy(t_np),
                torch.from_numpy(mix),
            )
        _, x_mean_o = pred_o.update(
            jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t_np),
            jnp.asarray(mix), dt=1.0 / SDE_ARGS["N"],
        )
        ref_np = x_mean_ref.numpy()
        scale = max(np.abs(ref_np).max(), 1e-3)
        np.testing.assert_allclose(
            np.asarray(x_mean_o), ref_np, atol=2e-3 * scale, rtol=2e-3
        )


def test_ald2_corrector_step(pair, ref_sdes, rng):
    """Deterministic part (x_mean) of one ald2 corrector step through the
    full score network: pins the production corrector's matrix-std algebra
    x_mean = x + 2 snr^2 L L score (correctors.py:94-128)."""
    ref_sdes_mod, _, ref_corr_mod = ref_sdes
    tm, model, params = pair

    sde_ref = ref_sdes_mod.MixSDE(**SDE_ARGS)
    corr_ref = ref_corr_mod.AnnealedLangevinDynamics2(
        sde_ref, tm, snr=0.5, n_steps=1
    )

    from diffsep_tpu.sampling.correctors import AnnealedLangevinDynamics2
    from diffsep_tpu.sde import MixSDE

    sde_o = MixSDE(**SDE_ARGS)
    corr_o = AnnealedLangevinDynamics2(
        sde_o,
        lambda x_, t_, c_: model.score_apply(params, x_, t_, c_),
        snr=0.5,
        n_steps=1,
    )

    n = 1984
    x = _rand(rng, 1, 2, n) * 0.3
    mix = _rand(rng, 1, 1, n) * 0.3
    t_np = np.full((1,), 0.5, np.float32)
    with torch.no_grad():
        _, x_mean_ref = corr_ref.update_fn(
            torch.from_numpy(x), torch.from_numpy(t_np), torch.from_numpy(mix)
        )
    _, x_mean_o = corr_o.update(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t_np),
        jnp.asarray(mix),
    )
    ref_np = x_mean_ref.numpy()
    scale = max(np.abs(ref_np).max(), 1e-3)
    np.testing.assert_allclose(
        np.asarray(x_mean_o), ref_np, atol=2e-3 * scale, rtol=2e-3
    )
