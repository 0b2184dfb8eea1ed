"""End-to-end evaluation-CLI parity: OUR `evaluate.py` vs the reference's
`/root/reference/evaluate.py`, both driven as real CLIs over the SAME
synthetic WSJ0-2mix tree with the SAME converted weights and zero-noise
sampling.

The pipeline internals (score model, SDE, PC loop, losses) are pinned
piecewise in test_reference_pipeline_parity.py; what only a CLI-level run
can pin is everything around them: hparams.yaml/checkpoint resolution, the
dataset directory contract + file ordering + wav decoding, batch
normalization placement, sampler-config merging (config defaults + CLI
overrides), the inference-variant output dirname, permutation fixing, the
per-sample JSON record schema (si_sdr/si_sir/si_sar/pesq/stoi/nfe/runtime/
len_s) and the summary JSON.

The reference script is executed in-process via runpy with the absent
packages stubbed: torchaudio (torch.stft/scipy-wav stubs, the exact oracles
test_stft/test_data pin), pytorch_lightning/torch_ema/hydra/omegaconf
(functional stubs in test_reference_pipeline_parity), and the metric
packages (fast_bss_eval/pesq/pystoi) ADAPTED TO OUR OWN implementations on
both sides — so metric-value equality here pins that both CLIs feed the
same (est, ref, fs, mode) into the same metric semantics (ordering,
permutation, normalization), while the metric internals' correctness is
pinned separately (test_metrics.py anchors, models/pesq_native tests).

Upstream defect pinned by execution: the reference's `--test` path pops
`_target_` only from the val/train dataset configs (evaluate.py:275-285)
and then constructs WSJ0_mix(**cfg) with the test config's `_target_`
still present (datamodule/default.yaml) — TypeError.  The paper's test
numbers therefore must come from evaluate_mp.py (which pops it,
evaluate_mp.py:185); our evaluate CLI accepts --test.
"""
import json
import runpy
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
    not (REF / "evaluate.py").exists(),
    reason="reference checkout not available",
)

from tests.test_reference_pipeline_parity import (  # noqa: E402
    BACKBONE,
    SDE_ARGS,
    STFT_ARGS,
    _install_hydra_stub,
    _install_ref_pl_stubs,
    _install_torchaudio_stub,
)

FS = 8000
UTT_LEN = FS  # exactly one 1-s length bucket: our eval pads to the bucket,
# so equal lengths make the padded program identical to the reference's
N_UTT = 2


def _install_metric_stubs():
    """fast_bss_eval / pesq / pystoi adapters over OUR implementations.

    Non-circularity note: these stubs make metric equality pin the CLI
    PLUMBING (what est/ref/fs/mode each CLI passes, in which order, after
    which permutation), not the metric internals — those have their own
    independently-anchored tests."""
    from diffsep_tpu.models import metrics as our_metrics

    def _stub_module(name):
        mod = sys.modules.setdefault(name, types.ModuleType(name))
        # conftest's containment fixture pops marked stubs after each test
        # so they cannot shadow the optional packages for the rest of the
        # suite (product code probes `import pesq` etc. — pesq_native.py:517)
        mod.__diffsep_test_stub__ = True
        return mod

    fbe = _stub_module("fast_bss_eval")

    def si_bss_eval_sources(ref, est, zero_mean=False,
                            compute_permutation=True, clamp_db=100):
        sdr, sir, sar, perm = our_metrics.si_bss_eval_sources(
            np.asarray(ref), np.asarray(est), zero_mean=zero_mean,
            compute_permutation=compute_permutation, clamp_db=clamp_db,
        )
        return (
            torch.from_numpy(np.asarray(sdr)),
            torch.from_numpy(np.asarray(sir)),
            torch.from_numpy(np.asarray(sar)),
            torch.from_numpy(np.asarray(perm)),
        )

    fbe.si_bss_eval_sources = si_bss_eval_sources

    from diffsep_tpu.models.pesq_native import pesq as _native_pesq

    pesq_mod = _stub_module("pesq")
    pesq_mod.pesq = lambda fs, ref, deg, mode: float(
        _native_pesq(fs, np.asarray(ref), np.asarray(deg), mode)
    )

    pystoi = _stub_module("pystoi")
    pystoi.stoi = lambda ref, deg, fs, extended=False: float(
        our_metrics.stoi(np.asarray(ref), np.asarray(deg), fs,
                         extended=extended)
    )


def _write_wav(path, x, fs=FS):
    from scipy.io import wavfile

    path.parent.mkdir(parents=True, exist_ok=True)
    q = (np.clip(x, -1.0, 1.0) * 32767.0).astype(np.int16)
    wavfile.write(str(path), fs, q)


@pytest.fixture(scope="module")
def eval_env(tmp_path_factory):
    """Synthetic WSJ0-2mix tree (val split) + a reference-layout experiment
    dir (checkpoints/checkpoint.pt + hparams.yaml) sharing one tiny trained
    torch ScoreModelNCSNpp whose weights our loader converts."""
    import yaml

    root = tmp_path_factory.mktemp("wsj0")
    split_dir = root / "2speakers" / "wav8k" / "max" / "cv"
    rng = np.random.default_rng(7)
    t = np.arange(UTT_LEN) / FS
    for i in range(N_UTT):
        f1, f2 = 180.0 + 60 * i, 310.0 + 45 * i
        s1 = 0.30 * np.sin(2 * np.pi * f1 * t + 0.3 * i)
        s1 += 0.02 * rng.standard_normal(UTT_LEN)
        s2 = 0.25 * np.sin(2 * np.pi * f2 * t + 0.8 * i)
        s2 += 0.02 * rng.standard_normal(UTT_LEN)
        _write_wav(split_dir / "s1" / f"utt{i}.wav", s1)
        _write_wav(split_dir / "s2" / f"utt{i}.wav", s2)
        _write_wav(split_dir / "mix" / f"utt{i}.wav", s1 + s2)
    # the test (tt) split exists but is only reached by OUR CLI — the
    # reference's --test crashes on the _target_ defect (pinned below)
    tt = root / "2speakers" / "wav8k" / "max" / "tt"
    for sub in ("mix", "s1", "s2"):
        (tt / sub).mkdir(parents=True, exist_ok=True)
        _write_wav(tt / sub / "utt0.wav",
                   0.1 * np.sin(2 * np.pi * 200 * t))

    # --- build the torch model + reference-layout checkpoint -------------
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
    score_cfg = {
        "_target_": "models.score_models.ScoreModelNCSNpp",
        "num_sources": 2,
        "stft_args": dict(STFT_ARGS),
        "backbone_args": {"_target_": "models.ncsnpp.NCSNpp", **BACKBONE},
        "transform": "exponent",
        "spec_abs_exponent": 0.5,
        "spec_factor": 0.33,
        "spec_trans_learnable": False,
    }
    tm = TorchScoreModel(
        **{k: v for k, v in score_cfg.items() if k != "_target_"}
    )
    tm.eval()

    def ds_cfg(split, max_len_s=None):
        return {
            "_target_": "datasets.WSJ0_mix",
            "path": str(root),
            "n_spkr": 2,
            "fs": FS,
            "cut": "max",
            "split": split,
            "max_len_s": max_len_s,
            "max_n_samples": None,
        }

    config = {
        "model": {
            "n_speakers": 2,
            "fs": FS,
            "t_eps": 0.03,
            "ema_decay": 0.999,
            "score_model": score_cfg,
            "sde": {"_target_": "sdes.sdes.MixSDE", **SDE_ARGS},
            "sampler": {"N": 4, "snr": 0.5, "corrector_steps": 1},
            "loss": {"_target_": "torch.nn.MSELoss"},
            "val_losses": {},
            "optimizer": {"_target_": "torch.optim.Adam", "lr": 1e-4},
            "grad_clipper": {
                "_target_": "utils.FixedClipper", "max_norm": 5.0,
            },
        },
        "trainer": {"accumulate_grad_batches": 1},
        "datamodule": {
            "train": {"dl_opts": {}, "dataset": ds_cfg("train", 5)},
            "val": {"dl_opts": {}, "dataset": ds_cfg("val")},
            "test": {"dl_opts": {}, "dataset": ds_cfg("test")},
        },
    }

    exp_dir = tmp_path_factory.mktemp("exp")
    (exp_dir / "checkpoints").mkdir()
    ckpt_path = exp_dir / "checkpoints" / "checkpoint.pt"
    shadow = [p.detach().clone() for p in tm.parameters() if p.requires_grad]
    torch.save(
        {
            "state_dict": {
                f"score_model.{k}": v for k, v in tm.state_dict().items()
            },
            "ema": {
                "decay": 0.999,
                "num_updates": 10,
                "shadow_params": shadow,
            },
            "hyper_parameters": {"config": config},
        },
        ckpt_path,
    )
    with open(exp_dir / "hparams.yaml", "w") as f:
        yaml.safe_dump({"config": config}, f)

    return types.SimpleNamespace(root=root, ckpt=ckpt_path, config=config)


def _run_reference_cli(eval_env, out_dir, extra_argv=(), init_globals=None):
    """Execute /root/reference/evaluate.py as __main__ in-process."""
    _install_torchaudio_stub()
    _install_hydra_stub()
    _install_ref_pl_stubs()
    _install_metric_stubs()
    # a fresh pl_model import picks up the (functional) Lightning stub even
    # if an earlier test already imported it against the bare one
    sys.modules.pop("pl_model", None)
    argv = [
        "evaluate.py", str(eval_env.ckpt), "-o", str(out_dir),
        "-d", "cpu", "-w", "0", "--save-n", "0", *extra_argv,
    ]
    old_argv = sys.argv
    sys.argv = argv
    sys.path.insert(0, str(REF))
    try:
        runpy.run_path(
            str(REF / "evaluate.py"),
            init_globals=init_globals,
            run_name="__main__",
        )
    finally:
        sys.argv = old_argv
        sys.path.remove(str(REF))


def _zero_noise_both(monkeypatch):
    import jax.random as jrandom

    monkeypatch.setattr(torch, "randn_like", lambda x: torch.zeros_like(x))
    monkeypatch.setattr(
        jrandom,
        "normal",
        lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype),
    )


def test_evaluate_cli_end_to_end_parity(eval_env, monkeypatch, tmp_path):
    """Both CLIs over the same val split, zero noise, one CLI override
    (N=3, exercising the config-vs-CLI sampler merge): per-sample records,
    summaries, and the inference-tagged output dirname must agree."""
    _zero_noise_both(monkeypatch)

    ref_out = tmp_path / "ref_results"
    _run_reference_cli(eval_env, ref_out, ["--val", "-N", "3"])

    from diffsep_tpu import model as model_mod
    from diffsep_tpu.cli import evaluate as our_eval

    model_mod._jit_pc_sample.clear_cache()  # earlier tests traced real noise
    our_out = tmp_path / "our_results"
    our_eval.main(
        [str(eval_env.ckpt), "-o", str(our_out), "--val", "-N", "3",
         "--save-n", "0"]
    )

    ref_dirs = sorted(p.name for p in ref_out.iterdir())
    our_dirs = sorted(p.name for p in our_out.iterdir())
    assert ref_dirs == our_dirs, (ref_dirs, our_dirs)
    assert "N-3_snr-0.5_corrstep-1_denoise-True_schedule-None" in ref_dirs[0]

    ref_recs = json.loads((ref_out / ref_dirs[0] / "val.json").read_text())
    our_recs = json.loads((our_out / our_dirs[0] / "val.json").read_text())
    assert len(ref_recs) == len(our_recs) == N_UTT

    for r, o in zip(ref_recs, our_recs):
        assert list(r.keys()) == list(o.keys()), (r.keys(), o.keys())
        assert r["batch_idx"] == o["batch_idx"]
        assert r["nfe"] == o["nfe"] == 3 * 2
        assert r["len_s"] == o["len_s"] == UTT_LEN / FS
        for met in ("si_sdr", "si_sir", "si_sar", "pesq", "stoi"):
            np.testing.assert_allclose(
                np.asarray(o[met], np.float64),
                np.asarray(r[met], np.float64),
                atol=0.1, rtol=1e-3,
                err_msg=f"{met} diverged (rec {r['batch_idx']})",
            )

    ref_sum = json.loads(
        (ref_out / ref_dirs[0] / "val_summary.json").read_text()
    )
    our_sum = json.loads(
        (our_out / our_dirs[0] / "val_summary.json").read_text()
    )
    assert set(ref_sum.keys()) == set(our_sum.keys())
    for met in ("si_sdr", "si_sir", "si_sar", "pesq", "stoi", "batch_idx",
                "nfe", "len_s", "number"):
        np.testing.assert_allclose(
            our_sum[met], ref_sum[met], atol=0.1, rtol=1e-3,
            err_msg=f"summary {met}",
        )


def test_evaluate_cli_no_proc_sentinel_parity(eval_env, monkeypatch,
                                              tmp_path):
    """The __no_proc__ sentinel (score the raw mixture as the floor
    baseline, evaluate.py:243-254 + 352-357): identical records from both
    CLIs — deterministic, so exact schema AND tight values.  The sentinel
    constructs WSJ0_mix WITHOUT fs, i.e. the class default fs=16000
    (wsj0_mix.py:29) — it scores ./data/wsj0_mix/2speakers/wav16k."""
    monkeypatch.chdir(tmp_path)
    root16 = tmp_path / "wsj16"
    t16 = np.arange(2 * 16000) / 16000.0
    rng = np.random.default_rng(3)
    for i in range(N_UTT):
        s1 = 0.3 * np.sin(2 * np.pi * (200 + 70 * i) * t16)
        s1 += 0.02 * rng.standard_normal(t16.size)
        s2 = 0.25 * np.sin(2 * np.pi * (330 + 50 * i) * t16)
        s2 += 0.02 * rng.standard_normal(t16.size)
        cv = root16 / "2speakers" / "wav16k" / "max" / "cv"
        _write_wav(cv / "s1" / f"utt{i}.wav", s1, fs=16000)
        _write_wav(cv / "s2" / f"utt{i}.wav", s2, fs=16000)
        _write_wav(cv / "mix" / f"utt{i}.wav", s1 + s2, fs=16000)
    (tmp_path / "data").mkdir()
    (tmp_path / "data" / "wsj0_mix").symlink_to(root16)

    # upstream defect by execution: the sentinel branch never defines
    # n_src (only the else-branch does, evaluate.py:268,286) so the
    # metrics call at evaluate.py:388 dies — the reference's own floor
    # baseline cannot run as written
    with pytest.raises(NameError, match="n_src"):
        _run_reference_cli(
            types.SimpleNamespace(ckpt="__no_proc__"),
            tmp_path / "ref_crash", ["--val"],
        )

    ref_out = tmp_path / "ref_results"
    _run_reference_cli(
        types.SimpleNamespace(ckpt="__no_proc__"), ref_out, ["--val"],
        init_globals={"n_src": 2},  # the one-name defusal of the defect
    )

    from diffsep_tpu.cli import evaluate as our_eval

    our_out = tmp_path / "our_results"
    our_eval.main(["__no_proc__", "-o", str(our_out), "--val"])

    ref_recs = json.loads((ref_out / "mix" / "val.json").read_text())
    our_recs = json.loads((our_out / "mix" / "val.json").read_text())
    assert len(ref_recs) == len(our_recs) == N_UTT
    for r, o in zip(ref_recs, our_recs):
        assert list(r.keys()) == list(o.keys())
        for met in ("si_sdr", "si_sir", "si_sar", "pesq", "stoi"):
            np.testing.assert_allclose(
                np.asarray(o[met], np.float64),
                np.asarray(r[met], np.float64),
                atol=1e-3, rtol=1e-5, err_msg=met,
            )
        assert r["nfe"] == o["nfe"] == 0


def test_reference_test_split_target_defect(eval_env, tmp_path):
    """Upstream defect by execution: `evaluate.py --test` constructs
    WSJ0_mix(**config) with `_target_` still in the test dataset config
    (only val/train get popped, evaluate.py:275-285) — TypeError.  Our CLI
    accepts --test (it pops _target_ for every split)."""
    with pytest.raises(TypeError, match="_target_"):
        _run_reference_cli(eval_env, tmp_path / "ref_results", ["--test"])


# ===========================================================================
# --enhance mode (the noise-reduction recipe's eval path): PriorMixSDE +
# NoisyDataset, n_src=1 (evaluate.py:267-271)
# ===========================================================================


@pytest.fixture(scope="module")
def enhance_env(tmp_path_factory):
    """Synthetic VCTK-DEMAND tree (test split, 16 kHz) + a reference-layout
    checkpoint whose config is the nr recipe's shape: PriorMixSDE
    (config/model/nr.yaml:31-37) and a NoisyDataset test entry."""
    import yaml

    sys.path.insert(0, str(REF))
    try:
        from tests.test_ncsnpp import _install_reference_op_stub

        _install_reference_op_stub()
        _install_torchaudio_stub()
        _install_hydra_stub()
        from models.score_models import ScoreModelNCSNpp as TorchScoreModel
    finally:
        sys.path.remove(str(REF))

    fs = 16000
    root = tmp_path_factory.mktemp("vctk")
    rng = np.random.default_rng(17)
    t = np.arange(fs) / fs  # exactly one 1-s bucket
    for d in ("noisy", "clean"):
        (root / "test" / d).mkdir(parents=True)
    for i in range(N_UTT):
        clean = 0.3 * np.sin(2 * np.pi * (230 + 70 * i) * t)
        clean += 0.01 * rng.standard_normal(fs)
        noisy = clean + 0.08 * rng.standard_normal(fs)
        _write_wav(root / "test" / "clean" / f"p{i}.wav", clean, fs=fs)
        _write_wav(root / "test" / "noisy" / f"p{i}.wav", noisy, fs=fs)

    torch.manual_seed(1)
    stft = {"n_fft": 126, "hop_length": 32, "center": True,
            "pad_mode": "constant"}
    score_cfg = {
        "_target_": "models.score_models.ScoreModelNCSNpp",
        "num_sources": 2,
        "stft_args": stft,
        "backbone_args": {"_target_": "models.ncsnpp.NCSNpp", **BACKBONE},
        "transform": "exponent",
        "spec_abs_exponent": 0.5,
        "spec_factor": 0.33,
        "spec_trans_learnable": False,
    }
    tm = TorchScoreModel(
        **{k: v for k, v in score_cfg.items() if k != "_target_"}
    )
    tm.eval()

    config = {
        "model": {
            "n_speakers": 2,
            "fs": fs,
            "t_eps": 0.03,
            "ema_decay": 0.999,
            "score_model": score_cfg,
            "sde": {"_target_": "sdes.sdes.PriorMixSDE", **SDE_ARGS},
            "sampler": {"N": 4, "snr": 0.5, "corrector_steps": 1},
            "loss": {"_target_": "torch.nn.MSELoss"},
            "val_losses": {},
            "optimizer": {"_target_": "torch.optim.Adam", "lr": 1e-4},
            "grad_clipper": {
                "_target_": "utils.FixedClipper", "max_norm": 5.0,
            },
        },
        "trainer": {"accumulate_grad_batches": 1},
        "datamodule": {
            "test": {
                "dl_opts": {},
                "dataset": {
                    "_target_": "datasets.NoisyDataset",
                    "audio_path": str(root),
                    "audio_len": 4,
                    "fs": fs,
                    "augmentation": False,
                    "split": "test",
                },
            },
        },
    }
    exp_dir = tmp_path_factory.mktemp("nr_exp")
    (exp_dir / "checkpoints").mkdir()
    ckpt_path = exp_dir / "checkpoints" / "checkpoint.pt"
    shadow = [p.detach().clone() for p in tm.parameters() if p.requires_grad]
    torch.save(
        {
            "state_dict": {
                f"score_model.{k}": v for k, v in tm.state_dict().items()
            },
            "ema": {"decay": 0.999, "num_updates": 10,
                    "shadow_params": shadow},
            "hyper_parameters": {"config": config},
        },
        ckpt_path,
    )
    with open(exp_dir / "hparams.yaml", "w") as f:
        yaml.safe_dump({"config": config}, f)
    return types.SimpleNamespace(root=root, ckpt=ckpt_path)


def test_evaluate_cli_enhance_mode_parity(enhance_env, monkeypatch,
                                          tmp_path):
    """--enhance end to end on both CLIs: PriorMixSDE's power-envelope
    prior/marginals through the real sampler, the NoisyDataset test
    contract (tgt = [clean, noisy-clean]), n_src=1 metric slicing, and the
    same records/summary/dirname."""
    _zero_noise_both(monkeypatch)

    ref_out = tmp_path / "ref_results"
    _run_reference_cli(enhance_env, ref_out, ["--test", "--enhance",
                                              "-N", "3"])

    from diffsep_tpu import model as model_mod
    from diffsep_tpu.cli import evaluate as our_eval

    model_mod._jit_pc_sample.clear_cache()
    our_out = tmp_path / "our_results"
    our_eval.main(
        [str(enhance_env.ckpt), "-o", str(our_out), "--test", "--enhance",
         "-N", "3", "--save-n", "0"]
    )

    ref_dirs = sorted(p.name for p in ref_out.iterdir())
    our_dirs = sorted(p.name for p in our_out.iterdir())
    assert ref_dirs == our_dirs, (ref_dirs, our_dirs)

    ref_recs = json.loads((ref_out / ref_dirs[0] / "test.json").read_text())
    our_recs = json.loads((our_out / our_dirs[0] / "test.json").read_text())
    assert len(ref_recs) == len(our_recs) == N_UTT
    for r, o in zip(ref_recs, our_recs):
        assert list(r.keys()) == list(o.keys())
        assert len(r["si_sdr"][0]) == len(o["si_sdr"][0]) == 1  # n_src=1
        assert r["nfe"] == o["nfe"] == 3 * 2
        for met in ("si_sdr", "si_sir", "si_sar", "pesq", "stoi"):
            np.testing.assert_allclose(
                np.asarray(o[met], np.float64),
                np.asarray(r[met], np.float64),
                atol=0.1, rtol=1e-3, err_msg=met,
            )
