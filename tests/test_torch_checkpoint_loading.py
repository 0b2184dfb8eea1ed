"""End-to-end torch checkpoint loading: a synthetic Lightning checkpoint
with the reference's exact layout (state_dict keys 'score_model.backbone.*',
'hyper_parameters' config, torch_ema 'ema' blob — separate.py:36-48,
pl_model.py:672-673) is converted and must produce the same score as the
torch reference network.
"""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def torch_ref():
    sys.path.insert(0, "/root/reference")
    import torch

    from diffsep_tpu.ops.upfirdn2d import upfirdn2d as jax_upfirdn2d

    def upfirdn2d_torch(input, kernel, up=1, down=1, pad=(0, 0)):
        out = jax_upfirdn2d(
            jnp.asarray(input.detach().numpy()),
            jnp.asarray(kernel.detach().numpy()),
            up=up, down=down, pad=tuple(int(p) for p in pad),
        )
        return torch.from_numpy(np.asarray(out))

    op_mod = types.ModuleType("models.ncsnpp_utils.op")
    op_mod.upfirdn2d = upfirdn2d_torch
    op_mod.fused_leaky_relu = None
    op_mod.FusedLeakyReLU = None
    sys.modules.setdefault("models.ncsnpp_utils.op", op_mod)
    import importlib

    mod = importlib.import_module("models.ncsnpp")
    yield mod.NCSNpp
    sys.path.remove("/root/reference")


def test_load_torch_checkpoint_end_to_end(tmp_path, rng, torch_ref):
    import torch

    from diffsep_tpu.cli.loading import load_model

    cfg_backbone = dict(
        nf=8,
        ch_mult=[1, 2],
        num_res_blocks=1,
        attn_resolutions=[16],
        image_size=64,
        num_channels_in=6,
        num_channels_out=4,
    )
    torch_model = torch_ref(**cfg_backbone)
    torch_model.eval()

    # reference-checkpoint layout
    state_dict = {
        f"score_model.backbone.{k}": v for k, v in torch_model.state_dict().items()
    }
    # torch_ema shadow list over trainable params, scaled so EMA != raw
    shadow = [
        (1.5 * p.detach().clone()) for p in torch_model.parameters() if p.requires_grad
    ]
    ckpt = {
        "state_dict": state_dict,
        "ema": {"decay": 0.999, "num_updates": 100, "shadow_params": shadow},
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
                        "stft_args": {
                            "n_fft": 126,
                            "hop_length": 32,
                            "center": True,
                        },
                        "backbone_args": {
                            "_target_": "models.ncsnpp.NCSNpp",
                            **cfg_backbone,
                        },
                        "transform": "exponent",
                        "spec_abs_exponent": 0.5,
                        "spec_factor": 0.15,
                        "spec_trans_learnable": False,
                    },
                    "sde": {
                        "_target_": "sdes.sdes.MixSDE",
                        "ndim": 2,
                        "d_lambda": 2.0,
                        "sigma_min": 0.05,
                        "sigma_max": 0.5,
                        "N": 30,
                    },
                    "sampler": {"N": 30, "snr": 0.5, "corrector_steps": 1},
                    "optimizer": {"_target_": "torch.optim.Adam", "lr": 1e-4},
                    "grad_clipper": {
                        "_target_": "utils.FixedClipper",
                        "max_norm": 5.0,
                    },
                },
                "trainer": {"accumulate_grad_batches": 1},
                "datamodule": {},
            }
        },
    }
    path = tmp_path / "checkpoint.pt"
    torch.save(ckpt, path)

    model, params = load_model(path)
    assert model.sde.N == 30 and model.t_eps == 0.03

    # converted EMA backbone == 1.5x the raw weights at the output layer
    out_kernel = params["backbone"]["output_layer"]["kernel"]
    raw = torch_model.output_layer.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(np.asarray(out_kernel), 1.5 * raw, rtol=1e-6)

    # backbone forward with the EMA weights matches torch run at 1.5x params
    with torch.no_grad():
        for p in torch_model.parameters():
            if p.requires_grad:
                p.mul_(1.5)
    x = rng.uniform(-1, 1, (1, 64, 16, 6)).astype(np.float32)
    t = np.asarray([0.6], np.float32)
    with torch.no_grad():
        ref = torch_model(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(t)
        ).numpy()
    ours = np.asarray(
        model.score_model.backbone.apply(
            {"params": params["backbone"]}, jnp.asarray(x), jnp.asarray(t)
        )
    ).transpose(0, 3, 1, 2)
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(ours, ref, atol=3e-4 * scale, rtol=1e-3)

    # the full separation path runs with the loaded weights
    mix = jnp.asarray(rng.standard_normal((1, 1, 2000)).astype(np.float32))
    est, nfe = model.separate(params, jax.random.PRNGKey(0), mix, N=2)
    assert est.shape == (1, 2, 2000)
    assert np.isfinite(np.asarray(est)).all()


def test_save_reference_checkpoint_roundtrip(tmp_path, rng):
    """Full interop circle: a model initialized HERE is exported as a
    reference-layout torch checkpoint (cli/export_model.py --torch /
    models/convert.py:save_reference_checkpoint) and loaded BACK through
    the torch-checkpoint path of our loader — identical weights, identical
    score forward, reference `_target_` paths in hyper_parameters."""
    import torch

    from diffsep_tpu.cli.export_model import main as export_main
    from diffsep_tpu.cli.loading import load_model
    from diffsep_tpu.config import compose
    from diffsep_tpu.model import DiffSepModel
    from diffsep_tpu.models.convert import save_reference_checkpoint

    cfg = compose([
        "model.score_model.backbone_args.nf=8",
        "model.score_model.backbone_args.ch_mult=[1,2]",
        "model.score_model.backbone_args.num_res_blocks=1",
        "model.score_model.backbone_args.attn_resolutions=[16]",
        "model.score_model.backbone_args.image_size=64",
        "model.score_model.stft_args.n_fft=126",
        "model.score_model.stft_args.hop_length=32",
    ])
    model = DiffSepModel(cfg)
    mix = jnp.asarray(rng.standard_normal((1, 1, 2000)), jnp.float32) * 0.1
    tgt = jnp.zeros((1, 2, 2000), jnp.float32)
    params = model.init_params(jax.random.PRNGKey(3), mix, tgt)

    path = tmp_path / "exported.ckpt"
    save_reference_checkpoint(path, params, cfg)

    # the saved config carries REFERENCE import paths (loadable by the
    # reference's hydra instantiate), not ours
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    hp = ckpt["hyper_parameters"]["config"]["model"]
    assert hp["score_model"]["_target_"] == "models.score_models.ScoreModelNCSNpp"
    assert hp["score_model"]["backbone_args"]["_target_"] == "models.ncsnpp.NCSNpp"
    assert hp["sde"]["_target_"] == "sdes.sdes.MixSDE"
    assert all(
        k.startswith("score_model.") for k in ckpt["state_dict"].keys()
    )

    model2, params2 = load_model(path)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(params))
    flat2 = dict(jax.tree_util.tree_leaves_with_path(params2))
    assert set(flat1) == set(flat2)
    for k, v in flat1.items():
        np.testing.assert_allclose(np.asarray(v), np.asarray(flat2[k]),
                                   atol=0, rtol=0)

    x = jnp.asarray(rng.standard_normal((1, 2, 2000)), jnp.float32) * 0.1
    t = jnp.full((1,), 0.5, jnp.float32)
    s1 = np.asarray(model.score_apply(params, x, t, mix))
    s2 = np.asarray(model2.score_apply(params2, x, t, mix))
    np.testing.assert_allclose(s1, s2, atol=1e-6)

    # and the CLI spelling works (rejecting sampler flags, which are a
    # run-time choice in the reference)
    out2 = tmp_path / "cli.ckpt"
    import pytest as _pytest

    export_main([str(path), "-o", str(out2), "--torch"])
    assert out2.exists()
    with _pytest.raises(SystemExit, match="sampler flags"):
        export_main([str(path), "-o", str(out2), "--torch", "-N", "4"])
