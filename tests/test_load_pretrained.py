"""load_pretrained warm-start (reference train.py:25-83).

The reference's feature is broken upstream — pinned here BY EXECUTION in
both of its branches:

  1. lightning layout (hparams.yaml at ckpt.parents[1]): the merge line
     mutates `config.model.seld_model` (train.py:68), a leftover key from
     another project that DiffSep's config never defines -> AttributeError.
  2. calibration layout (hparams.yaml at ckpt.parents[0]): the branch
     checks hparams_path_alt but then opens hparams_path — the OTHER
     location (train.py:47-50) -> FileNotFoundError before the seld line.

Ours realizes the intent (tests below + the CLI-level warm start in
test_e2e.py): merge the pretrained run's score_model subtree into the new
config, strict-graft the pretrained weights into a fresh TrainState
(optimizer/step untouched), train from there.
"""
import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = Path("/root/reference")


@pytest.fixture()
def ref_train(tmp_path):
    if not (REF / "train.py").exists():
        pytest.skip("reference checkout not available")
    from tests.test_reference_pipeline_parity import (
        _install_hydra_stub,
        _install_ref_pl_stubs,
        _install_torchaudio_stub,
    )

    _install_torchaudio_stub()
    _install_hydra_stub()
    _install_ref_pl_stubs()
    hy = sys.modules["hydra"]
    if not hasattr(hy, "main"):
        hy.main = lambda **kw: (lambda f: f)
    if "hydra.core.hydra_config" not in sys.modules:
        core = types.ModuleType("hydra.core")
        hc = types.ModuleType("hydra.core.hydra_config")

        class HydraConfig:
            pass

        hc.HydraConfig = HydraConfig
        core.hydra_config = hc
        hy.core = core
        sys.modules["hydra.core"] = core
        sys.modules["hydra.core.hydra_config"] = hc
    pl = sys.modules["pytorch_lightning"]
    if "pytorch_lightning.loggers" not in sys.modules:
        lg = types.ModuleType("pytorch_lightning.loggers")
        lg.TensorBoardLogger = type("TensorBoardLogger", (), {})
        pl.loggers = lg
        sys.modules["pytorch_lightning.loggers"] = lg
    sys.modules.pop("pl_model", None)
    sys.modules.pop("train", None)
    sys.path.insert(0, str(REF))
    try:
        import train as ref_train_mod
    finally:
        sys.path.remove(str(REF))
    return ref_train_mod


def _diffsep_config(lp):
    """A DiffSep-shaped config (datamodule/default.yaml keys) with
    load_pretrained set — note: NO seld_model anywhere, faithfully."""
    from tests.test_reference_pipeline_parity import _attrify

    return _attrify(
        {
            "load_pretrained": str(lp),
            "model": {
                "score_model": {"_target_": "x", "num_sources": 2},
            },
        }
    )


def test_reference_lightning_branch_seld_defect(ref_train, tmp_path):
    """Branch 2 by execution: hparams.yaml at parents[1] resolves, the
    config subtree is read, and the merge dies on the seld_model leftover
    (train.py:68) — DiffSep's own config has no such key."""
    import yaml

    exp = tmp_path / "exp0"
    (exp / "checkpoints").mkdir(parents=True)
    ckpt = exp / "checkpoints" / "epoch-001.ckpt"
    ckpt.write_bytes(b"not-read-before-the-crash")
    with open(exp / "hparams.yaml", "w") as f:
        yaml.safe_dump(
            {"config": {"model": {"score_model": {"nf": 8}}}}, f
        )
    with pytest.raises(AttributeError, match="seld_model"):
        ref_train.load_model(_diffsep_config(ckpt))


def test_reference_calibration_branch_wrong_path_defect(ref_train,
                                                        tmp_path):
    """Branch 1 by execution: with hparams.yaml NEXT to the checkpoint
    (the calibration layout the branch is for), the code opens
    hparams_path — parents[1]'s file — which does not exist
    (train.py:47-50)."""
    import yaml

    d = tmp_path / "calib"
    d.mkdir()
    ckpt = d / "checkpoint.pt"
    ckpt.write_bytes(b"not-read-before-the-crash")
    with open(d / "hparams.yaml", "w") as f:
        yaml.safe_dump(
            {"config": {"model": {"score_model": {"nf": 8}}}}, f
        )
    with pytest.raises(FileNotFoundError):
        ref_train.load_model(_diffsep_config(ckpt))


def test_fit_grafts_pretrained_params(tmp_path):
    """The loop-level warm start: init_params/init_ema_params replace the
    random init exactly (strict tree/shape match), optimizer and step stay
    fresh; training then proceeds from the grafted weights."""
    from diffsep_tpu.config import compose
    from diffsep_tpu.model import DiffSepModel
    from diffsep_tpu.train.loop import fit

    cfg = compose(
        [
            "model.score_model.backbone_args.nf=8",
            "model.score_model.backbone_args.ch_mult=[1,2]",
            "model.score_model.backbone_args.num_res_blocks=1",
            "model.score_model.stft_args.n_fft=126",
            "model.score_model.stft_args.hop_length=32",
            "trainer.max_steps=1",
            "trainer.max_epochs=1",
            "datamodule.train.dl_opts.batch_size=2",
        ]
    )
    model = DiffSepModel(cfg)

    rng = np.random.default_rng(2)
    tgt = rng.standard_normal((2, 2, 1600)).astype(np.float32) * 0.1
    mix = tgt.sum(axis=1, keepdims=True)
    dm = types.SimpleNamespace(
        train_dataloader=lambda: [(mix, tgt)],
        val_dataloader=lambda: [],
    )

    mix0, tgt0 = next(iter(dm.train_dataloader()))
    donor = model.init_state(
        jax.random.PRNGKey(123), jnp.asarray(mix0), jnp.asarray(tgt0)
    )
    donor_params = jax.tree_util.tree_map(
        lambda a: np.asarray(a) * 0.5 + 0.01, donor.params
    )
    donor_ema = jax.tree_util.tree_map(
        lambda a: np.asarray(a) * 0.25 - 0.01, donor.params
    )

    # max_epochs=0: no train step runs, so the returned state IS the
    # freshly-initialized one with the graft applied
    state = fit(
        model, dm, tmp_path / "run", seed=7, max_epochs=0,
        init_params=donor_params, init_ema_params=donor_ema,
    )
    got = jax.tree_util.tree_leaves(state.params)
    want = jax.tree_util.tree_leaves(donor_params)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    got_e = jax.tree_util.tree_leaves(state.ema.params)
    want_e = jax.tree_util.tree_leaves(donor_ema)
    for g, w in zip(got_e, want_e):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    assert int(np.asarray(state.step)) == 0

    # ...and one real step from the grafted weights changes them (fresh
    # optimizer actually trains from the warm start; accumulation=1 so the
    # first micro-batch applies — a NEW model because the optimizer config
    # is captured at construction)
    cfg1 = compose(
        [
            "model.score_model.backbone_args.nf=8",
            "model.score_model.backbone_args.ch_mult=[1,2]",
            "model.score_model.backbone_args.num_res_blocks=1",
            "model.score_model.stft_args.n_fft=126",
            "model.score_model.stft_args.hop_length=32",
            "trainer.max_epochs=1",
            "trainer.accumulate_grad_batches=1",
            "datamodule.train.dl_opts.batch_size=2",
        ]
    )
    state1 = fit(
        DiffSepModel(cfg1), dm, tmp_path / "run1b", seed=7, max_steps=1,
        init_params=donor_params, init_ema_params=donor_ema,
    )
    pairs = list(zip(jax.tree_util.tree_leaves(state1.params),
                     jax.tree_util.tree_leaves(donor_params)))
    assert all(np.isfinite(np.asarray(a)).all() for a, _ in pairs)
    # some leaves are frozen by design (GaussianFourierProjection W); the
    # trainable ones must have moved
    assert any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0 for a, b in pairs
    )

    # strict-load: a wrong-shaped pretrained tree fails loudly
    bad = jax.tree_util.tree_map(
        lambda a: np.zeros(np.asarray(a).shape + (1,), np.float32),
        donor.params,
    )
    with pytest.raises(ValueError, match="pretrained shape"):
        fit(model, dm, tmp_path / "run2", seed=7, max_epochs=0,
            init_params=bad)


from tests.test_evaluate_cli_reference_parity import eval_env  # noqa: E402,F401


def test_pretrained_weights_torch_ckpt_raw_vs_ema(eval_env, tmp_path):
    """Reference-.ckpt warm start distinguishes raw state_dict weights
    from the torch_ema shadow: with shadow = raw + 1 injected, the raw
    tree keeps the state_dict values and the EMA tree carries the +1 on
    every trainable leaf.  Regression for the round-4 review finding:
    use_ema previously had no effect on the file-checkpoint branch of
    load_model — both calls returned the EMA tree, so a .ckpt warm start
    silently trained from EMA weights."""
    import torch

    ckpt = torch.load(str(eval_env.ckpt), map_location="cpu",
                      weights_only=False)
    ckpt["ema"]["shadow_params"] = [
        p + 1.0 for p in ckpt["ema"]["shadow_params"]
    ]
    p2 = tmp_path / "checkpoint.pt"
    torch.save(ckpt, p2)

    from diffsep_tpu.cli.loading import load_model, load_pretrained_weights

    model, raw, ema = load_pretrained_weights(p2)
    raw_l = jax.tree_util.tree_leaves(raw)
    ema_l = jax.tree_util.tree_leaves(ema)
    diffs = [
        float(np.abs(np.asarray(e) - np.asarray(r)).max())
        for r, e in zip(raw_l, ema_l)
    ]
    # trainable leaves moved by exactly 1; non-trainable (Fourier W) by 0
    assert max(diffs) == pytest.approx(1.0, abs=1e-6)
    assert sum(d > 0.5 for d in diffs) >= len(diffs) - 2

    # load_model honors use_ema on file checkpoints too
    _, p_raw = load_model(p2, use_ema=False)
    for a, b in zip(jax.tree_util.tree_leaves(p_raw), raw_l):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    _, p_ema = load_model(p2, use_ema=True)
    for a, b in zip(jax.tree_util.tree_leaves(p_ema), ema_l):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
