"""Config composition tests: the hydra-compatible engine must reproduce the
reference's composition semantics (groups, experiment overlays, dotted CLI
overrides, interpolation)."""
import numpy as np
import pytest

from diffsep_tpu.config import compose, instantiate


def test_default_compose():
    cfg = compose([])
    assert cfg.model.n_speakers == 2
    assert cfg.model.fs == 8000
    assert cfg.model.score_model.backbone_args.nf == 64
    assert cfg.trainer.accumulate_grad_batches == 2
    assert cfg.datamodule.train.dl_opts.batch_size == 16
    # interpolation
    assert cfg.model.score_model.num_sources == 2
    assert cfg.model.sde.ndim == 2
    assert cfg.datamodule.train.dataset.fs == 8000
    assert cfg.datamodule.train.dataset.path == "data/wsj0_mix"


def test_icassp_experiment_overlay():
    cfg = compose(["experiment=icassp-separation"])
    # experiment re-selects trainer allgpus and bumps nf/lr
    assert cfg.model.init_hack == 5
    assert cfg.model.init_hack_p == 0.1
    assert cfg.model.score_model.backbone_args.nf == 128
    assert cfg.model.score_model.spec_factor == 0.15
    assert cfg.model.optimizer.lr == 0.0002
    assert cfg.trainer.devices == -1
    assert cfg.trainer.accumulate_grad_batches == 2
    assert cfg.trainer.check_val_every_n_epoch == 5
    assert cfg.datamodule.train.dl_opts.batch_size == 6


def test_noise_reduction_experiment():
    cfg = compose(["experiment=noise-reduction"])
    assert cfg.name == "enhancement"
    assert cfg.model.init_hack == 4
    assert cfg.model.fs == 16000
    assert cfg.model.sde._target_.endswith("PriorMixSDE")
    assert cfg.trainer.accumulate_grad_batches == 4
    assert cfg.datamodule.train.dataset._target_.endswith("NoisyDataset")
    assert "val/pesq" in cfg.model.val_losses


def test_cli_overrides():
    cfg = compose(
        [
            "experiment=icassp-separation",
            "model.sde.sigma_min=0.1",
            "trainer.max_epochs=3",
            "+extra.flag=hello",
        ]
    )
    assert cfg.model.sde.sigma_min == 0.1
    assert cfg.trainer.max_epochs == 3
    assert cfg.extra.flag == "hello"


def test_instantiate_sde():
    cfg = compose(["experiment=icassp-separation"])
    sde = instantiate(cfg.model.sde)
    from diffsep_tpu.sde import MixSDE

    assert isinstance(sde, MixSDE)
    assert sde.ndim == 2 and sde.sigma_max == 0.5 and sde.N == 30


def test_instantiate_loss():
    cfg = compose([])
    loss = instantiate(cfg.model.val_losses["val/si_sdr"])
    from diffsep_tpu.models.losses import SISDRLoss

    assert isinstance(loss, SISDRLoss)
    assert loss.sign_flip and loss.clamp_db == 30
