"""End-to-end test of the real-weights parity harness
(scripts/parity_wsj0.py) with local stand-ins: a synthetic torch Lightning
checkpoint (as in test_torch_checkpoint_loading.py) and a tiny synthetic
WSJ0-2mix tt tree. Validates the exact pipeline that will run against the
published `fakufaku/diffsep` weights when egress exists (VERDICT item 5)."""
import json
import sys
from pathlib import Path

import numpy as np
import pytest

from diffsep_tpu.data.audio_io import save_wav

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))


@pytest.fixture
def wsj0_tt(tmp_path, rng):
    root = tmp_path / "wsj0_mix"
    base = root / "2speakers/wav8k/max/tt"
    for d in ["mix", "s1", "s2"]:
        (base / d).mkdir(parents=True)
    for i in range(2):
        L = 4000 + 800 * i
        s1 = rng.standard_normal((1, L)).astype(np.float32) * 0.1
        s2 = rng.standard_normal((1, L)).astype(np.float32) * 0.1
        save_wav(base / f"s1/f{i}.wav", s1, 8000)
        save_wav(base / f"s2/f{i}.wav", s2, 8000)
        save_wav(base / f"mix/f{i}.wav", s1 + s2, 8000)
    return root


@pytest.fixture
def tiny_lightning_ckpt(tmp_path):
    """Minimal reference-layout Lightning checkpoint with random weights."""
    import torch

    sys.path.insert(0, "/root/reference")
    from tests.test_ncsnpp import _install_reference_op_stub

    _install_reference_op_stub()
    from models.ncsnpp import NCSNpp as TorchNCSNpp

    cfg_backbone = dict(
        nf=8, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[16],
        image_size=64, num_channels_in=6, num_channels_out=4,
    )
    tm = TorchNCSNpp(**cfg_backbone)
    state_dict = {f"score_model.backbone.{k}": v for k, v in tm.state_dict().items()}
    shadow = [p.detach().clone() for p in tm.parameters() if p.requires_grad]
    ckpt = {
        "state_dict": state_dict,
        "ema": {"decay": 0.999, "num_updates": 10, "shadow_params": shadow},
        "hyper_parameters": {
            "config": {
                "model": {
                    "n_speakers": 2, "fs": 8000, "t_eps": 0.03,
                    "ema_decay": 0.999,
                    "score_model": {
                        "_target_": "models.score_models.ScoreModelNCSNpp",
                        "num_sources": 2,
                        "stft_args": {"n_fft": 126, "hop_length": 32, "center": True},
                        "backbone_args": {
                            "_target_": "models.ncsnpp.NCSNpp", **cfg_backbone,
                        },
                        "transform": "exponent",
                        "spec_abs_exponent": 0.5,
                        "spec_factor": 0.15,
                        "spec_trans_learnable": False,
                    },
                    "sde": {
                        "_target_": "sdes.sdes.MixSDE", "ndim": 2,
                        "d_lambda": 2.0, "sigma_min": 0.05, "sigma_max": 0.5,
                        "N": 30,
                    },
                    "sampler": {"N": 2, "snr": 0.5, "corrector_steps": 1},
                    "optimizer": {"_target_": "torch.optim.Adam", "lr": 1e-4},
                    "grad_clipper": {
                        "_target_": "utils.FixedClipper", "max_norm": 5.0,
                    },
                },
                "trainer": {"accumulate_grad_batches": 1},
                "datamodule": {
                    "test": {
                        "dataset": {
                            "_target_": "datasets.WSJ0_mix",
                            "path": "/nonexistent/wsj0_mix",
                            "n_spkr": 2, "cut": "max", "split": "test",
                            "fs": 8000,
                        }
                    }
                },
            }
        },
    }
    path = tmp_path / "checkpoint.pt"
    torch.save(ckpt, path)
    return path


def test_parity_harness_end_to_end(
    tmp_path, monkeypatch, capsys, wsj0_tt, tiny_lightning_ckpt
):
    import parity_wsj0

    workdir = tmp_path / "work"
    workdir.mkdir()
    monkeypatch.chdir(workdir)  # harness symlinks data/wsj0_mix in CWD

    out = tmp_path / "out"
    argv = [
        "--model", str(tiny_lightning_ckpt),
        "--data-root", str(wsj0_tt),
        "--limit", "2",
        "--split", "test",
        "--expected", "0.0",
        "--tol", "1e9",
        "--output-dir", str(out),
    ]
    parity_wsj0.main(argv)
    text = capsys.readouterr().out
    report = json.loads(text[text.rindex("{\n"):])  # last JSON object printed
    assert report["pass"] is True
    assert report["n_utts"] == 2
    assert np.isfinite(report["si_sdr_mean"])

    # a tight tolerance must FAIL the harness (exit code 1)
    with pytest.raises(SystemExit) as ei:
        parity_wsj0.main(argv[:-4] + ["--tol", "1e-6", "--output-dir", str(out)])
    assert ei.value.code == 1

    # the from-memory default expectation must never produce a PASS:
    # exit code 2 + an explicit UNVERIFIED marker, even at infinite tol
    no_expected = [a for i, a in enumerate(argv)
                   if argv[max(i - 1, 0)] != "--expected" and a != "--expected"]
    with pytest.raises(SystemExit) as ei:
        parity_wsj0.main(no_expected)
    assert ei.value.code == 2
    text = capsys.readouterr().out
    report = json.loads(text[text.rindex("{\n"):])
    assert report["pass"] is False
    assert "UNVERIFIED" in report["expected_provenance"]
    # and --trust-pinned restores the explicit opt-in path
    parity_wsj0.main(no_expected + ["--trust-pinned", "--tol", "1e9"])
    text = capsys.readouterr().out
    report = json.loads(text[text.rindex("{\n"):])
    assert report["pass"] is True
