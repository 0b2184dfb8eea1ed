"""End-to-end slice: train a tiny model via the CLI on a synthetic WSJ0-mix
tree, checkpoint it, then evaluate and separate with the saved run dir —
the full config -> model -> SDE -> sampler -> audio I/O path on CPU.
"""
import json
import os
import time
from pathlib import Path

import numpy as np
import pytest

from diffsep_tpu.data import save_wav


@pytest.fixture(scope="module")
def wsj0_tree(tmp_path_factory):
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("wsj0")
    for split in ["tr", "cv", "tt"]:
        base = root / f"2speakers/wav8k/max/{split}"
        for d in ["mix", "s1", "s2"]:
            (base / d).mkdir(parents=True)
        for i in range(2):
            L = 4800 + 800 * i
            s1 = rng.standard_normal((1, L)).astype(np.float32) * 0.1
            s2 = rng.standard_normal((1, L)).astype(np.float32) * 0.1
            save_wav(base / f"s1/f{i}.wav", s1, 8000)
            save_wav(base / f"s2/f{i}.wav", s2, 8000)
            save_wav(base / f"mix/f{i}.wav", s1 + s2, 8000)
    return root


def _tiny_overrides(wsj0_tree, exp_root):
    return [
        f"path.datasets.wsj0_mix={wsj0_tree}",
        f"path.exp_root={exp_root}",
        "model.score_model.backbone_args.nf=8",
        "model.score_model.backbone_args.ch_mult=[1,2]",
        "model.score_model.backbone_args.num_res_blocks=1",
        "model.score_model.backbone_args.attn_resolutions=[16]",
        "model.score_model.backbone_args.image_size=64",
        "model.score_model.stft_args.n_fft=126",
        "model.score_model.stft_args.hop_length=32",
        "model.sampler.N=2",
        "model.valid_max_sep_batches=1",
        "trainer.max_epochs=1",
        "trainer.max_steps=2",
        "trainer.accumulate_grad_batches=1",
        "trainer.devices=1",
        "trainer.check_val_every_n_epoch=1",
        "datamodule.train.dl_opts.batch_size=2",
        "datamodule.train.dataset.max_len_s=0.5",
        "datamodule.val.dl_opts.batch_size=2",
        "datamodule.test.dl_opts.batch_size=2",
    ]


@pytest.fixture(scope="module")
def trained_run_dir(wsj0_tree, tmp_path_factory):
    from diffsep_tpu.cli.train import main

    exp_root = tmp_path_factory.mktemp("exp")
    os.environ["PYTHONHASHSEED"] = "0"
    main(_tiny_overrides(wsj0_tree, exp_root))
    runs = sorted((exp_root / "default").iterdir())
    assert runs, "no run dir created"
    return runs[-1]


def test_train_creates_artifacts(trained_run_dir):
    assert (trained_run_dir / "hparams.yaml").exists()
    ckpts = trained_run_dir / "checkpoints"
    steps = [p for p in ckpts.iterdir() if p.name.isdigit()]
    assert steps, "no checkpoint saved"
    assert (ckpts / "best-model").exists()


def test_evaluate_cli(trained_run_dir, tmp_path):
    from diffsep_tpu.cli.evaluate import main

    out = tmp_path / "results"
    main(
        [
            str(trained_run_dir),
            "--test",
            "-o", str(out),
            "--limit", "1",
            "-N", "2",
            "--save-n", "0",
        ]
    )
    out_dirs = list(out.iterdir())
    assert len(out_dirs) == 1
    res = json.loads((out_dirs[0] / "test.json").read_text())
    assert len(res) == 1
    for k in ["si_sdr", "si_sir", "si_sar", "stoi", "nfe", "runtime", "len_s"]:
        assert k in res[0]
    assert res[0]["nfe"] == 4  # N * (corrector_steps + 1)
    summary = json.loads((out_dirs[0] / "test_summary.json").read_text())
    assert summary["number"] == 1


def test_evaluate_cli_avg_last_k(trained_run_dir, tmp_path):
    """--avg-last-k flows through evaluate: the checkpoint-averaged weights
    drive inference and the result dir is tagged with the number of
    checkpoints ACTUALLY averaged so averaged and plain runs never collide
    (the run has 1 checkpoint, so --avg-last-k 2 exercises the
    warn-and-average-all path and must tag _avgk-1, not _avgk-2; the
    averaging math itself is pinned in test_checkpoint_averaging.py)."""
    from diffsep_tpu.cli.evaluate import main

    out = tmp_path / "results_avg"
    main(
        [
            str(trained_run_dir),
            "--test",
            "-o", str(out),
            "--limit", "1",
            "-N", "2",
            "--save-n", "0",
            "--avg-last-k", "2",
        ]
    )
    out_dirs = list(out.iterdir())
    assert len(out_dirs) == 1
    assert out_dirs[0].name.endswith("_avgk-1")
    res = json.loads((out_dirs[0] / "test.json").read_text())
    assert len(res) == 1 and np.isfinite(res[0]["si_sdr"]).all()


def test_separate_cli(trained_run_dir, wsj0_tree, tmp_path):
    from diffsep_tpu.cli.separate import main

    in_dir = wsj0_tree / "2speakers/wav8k/max/tt/mix"
    out_dir = tmp_path / "sep"
    main(
        [
            str(in_dir),
            str(out_dir),
            "--model", str(trained_run_dir),
            "-N", "2",
        ]
    )
    for s in ["s0", "s1"]:
        wavs = list((out_dir / s).glob("*.wav"))
        assert len(wavs) == 2, f"missing outputs in {s}"


def test_evaluate_mp_cli(trained_run_dir, wsj0_tree, tmp_path, monkeypatch):
    """Sharded evaluation: tasks split over devices, merged JSON outputs."""
    import diffsep_tpu.cli.evaluate_mp as emp

    monkeypatch.chdir(wsj0_tree.parent)
    # point the dataset path into the synthetic tree via the saved hparams
    out = tmp_path / "mp_results"
    emp.main(
        [
            str(trained_run_dir),
            "--splits", "test",
            "-o", str(out),
            "-N", "2",
            "-l", "2",
        ]
    )
    out_dirs = list(out.iterdir())
    assert len(out_dirs) == 1
    res = json.loads((out_dirs[0] / "test.json").read_text())
    # reference-exact mp schema: dict keyed by (stringified) sample index
    assert isinstance(res, dict)
    assert [r["batch_idx"] for r in res.values()] == [0, 1]
    assert sorted(res.keys()) == ["0", "1"]
    assert (out_dirs[0] / "test_summary.json").exists()


def test_no_proc_sentinel(wsj0_tree, tmp_path, monkeypatch):
    """__no_proc__ scores the raw mixture as the floor baseline
    (evaluate.py:243-254)."""
    import os

    from diffsep_tpu.cli.evaluate import main

    workdir = tmp_path / "wd"
    (workdir / "data").mkdir(parents=True)
    # the sentinel scores wav16k (the reference constructs WSJ0_mix with
    # the class default fs=16000, evaluate.py:243-254); reuse the 8 k tree
    # under the 16 k directory name — fs only affects metric framing here
    root = workdir / "data" / "wsj0_mix" / "2speakers"
    root.mkdir(parents=True)
    os.symlink(wsj0_tree / "2speakers" / "wav8k", root / "wav16k")
    monkeypatch.chdir(workdir)
    out = tmp_path / "floor"
    main(["__no_proc__", "--test", "-o", str(out), "--limit", "1"])
    res = json.loads((out / "mix" / "test.json").read_text())
    assert res[0]["nfe"] == 0 and res[0]["runtime"] == 0.0
    # broadcasting the mixture to both sources: SI-SDR defined and finite
    assert np.isfinite(res[0]["si_sdr"]).all()


def test_enhancement_recipe_e2e(tmp_path_factory):
    """noise-reduction recipe: PriorMixSDE + Valentini datamodule train ->
    checkpoint -> evaluate --enhance (vctk_demand + nr.yaml parity)."""
    import numpy as np

    rng = np.random.default_rng(1)
    root = tmp_path_factory.mktemp("vctk")
    for split, n in [("train", 4), ("test", 2)]:
        for d in ["noisy", "clean"]:
            (root / split / d).mkdir(parents=True)
        for i in range(n):
            L = 9000
            c = rng.standard_normal((1, L)).astype(np.float32) * 0.1
            nz = c + rng.standard_normal((1, L)).astype(np.float32) * 0.03
            save_wav(root / split / f"clean/u{i}.wav", c, 16000)
            save_wav(root / split / f"noisy/u{i}.wav", nz, 16000)

    from diffsep_tpu.cli.train import main as train_main

    exp_root = tmp_path_factory.mktemp("exp_nr")
    train_main(
        [
            "experiment=noise-reduction",
            f"path.datasets.valentini={root}",
            f"path.exp_root={exp_root}",
            "model.score_model.backbone_args.nf=8",
            "model.score_model.backbone_args.ch_mult=[1,2]",
            "model.score_model.backbone_args.num_res_blocks=1",
            "model.score_model.backbone_args.image_size=64",
            "model.score_model.stft_args.n_fft=126",
            "model.score_model.stft_args.hop_length=32",
            "model.sampler.N=2",
            "datamodule.train.dataset.audio_len=0.4",
            "datamodule.train.dl_opts.batch_size=2",
            "trainer.max_epochs=1",
            "trainer.max_steps=1",
            "trainer.accumulate_grad_batches=1",
            "trainer.devices=1",
        ]
    )
    runs = sorted((exp_root / "enhancement").iterdir())
    assert runs

    from diffsep_tpu.cli.evaluate import main as eval_main

    out = exp_root / "results"
    eval_main(
        [
            str(runs[-1]),
            "--test", "--enhance",
            "-o", str(out),
            "-N", "2",
            "--limit", "1",
            "--save-n", "0",
        ]
    )
    res_dirs = list(out.iterdir())
    assert res_dirs
    res = json.loads((res_dirs[0] / "test.json").read_text())
    assert len(res) == 1 and len(res[0]["si_sdr"]) == 1  # n_src=1 in enhance
    # pesq must be finite without the GPL package (native P.862 fallback,
    # VERDICT round-1 item 4); note enhance eval runs at 16 kHz
    assert np.isfinite(res[0]["pesq"]).all(), res[0]["pesq"]


def test_evaluate_mp_batched(trained_run_dir, wsj0_tree, tmp_path, monkeypatch):
    """Throughput mode: bucketed batches, per-utterance metrics preserved."""
    import diffsep_tpu.cli.evaluate_mp as emp

    monkeypatch.chdir(wsj0_tree.parent)
    out = tmp_path / "mp_batched"
    emp.main(
        [
            str(trained_run_dir),
            "--splits", "test",
            "-o", str(out),
            "-N", "2",
            "-b", "2",
            "--bucket-s", "1.0",
        ]
    )
    out_dirs = list(out.iterdir())
    res = list(json.loads((out_dirs[0] / "test.json").read_text()).values())
    assert [r["batch_idx"] for r in res] == [0, 1]
    lens = sorted(r["len_s"] for r in res)
    assert lens[0] != lens[1]  # unpadded lengths preserved per utterance


def test_make_tasks():
    from diffsep_tpu.cli.evaluate_mp import make_tasks

    assert make_tasks(10, 3) == [(0, 4), (4, 8), (8, 10)]
    assert make_tasks(2, 8) == [(0, 1), (1, 2)]


def test_resume_from_checkpoint_cli(trained_run_dir, wsj0_tree, tmp_path):
    """trainer.resume_from_checkpoint=<other run dir> restores that run's
    training state into a NEW run dir (reference train.py:140-144) — this
    used to be a silent no-op because fit() only looked at the fresh run
    dir's own empty checkpoint store."""
    import yaml

    from diffsep_tpu.cli.loading import _config_from_hparams
    from diffsep_tpu.data.datamodule import WSJ0_mix_Module
    from diffsep_tpu.model import DiffSepModel
    from diffsep_tpu.train.loop import fit

    with open(trained_run_dir / "hparams.yaml") as f:
        cfg = _config_from_hparams(yaml.safe_load(f))
    model = DiffSepModel(cfg)
    dm = WSJ0_mix_Module(cfg, pad_to_multiple=int(cfg.model.fs))
    n_batches = sum(1 for _ in dm.train_dataloader())
    ckpt_steps = sorted(
        int(p.name) for p in (trained_run_dir / "checkpoints").iterdir()
        if p.name.isdigit()
    )
    last = ckpt_steps[-1]
    budget = last + 2 * n_batches  # let the resumed run make real progress
    state = fit(
        model, dm, tmp_path / "resumed_run",
        max_epochs=2, max_steps=budget, n_devices=1,
        resume=str(trained_run_dir),
    )
    # resumed run continues FROM the first run's last step (not from 0)
    assert last < int(state.step) <= budget

    # a specific orbax step dir also works
    step_dir = trained_run_dir / "checkpoints" / str(last)
    state2 = fit(
        model, dm, tmp_path / "resumed_run2",
        max_epochs=1, max_steps=budget, n_devices=1,
        resume=str(step_dir),
    )
    assert last < int(state2.step) <= budget

    # a bogus path must raise, not silently train from scratch
    with pytest.raises(FileNotFoundError):
        fit(
            model, dm, tmp_path / "resumed_run3",
            max_epochs=1, max_steps=3, n_devices=1,
            resume=str(tmp_path / "nope"),
        )


def test_preemption_checkpoint_and_resume(trained_run_dir, wsj0_tree, tmp_path):
    """SIGTERM mid-fit triggers an immediate checkpoint + clean return
    (trainer.preempt_save, on by default) — the TPU-pod preemption story:
    the reference gets the equivalent from Lightning's SIGTERM teardown.
    The saved step then restores via resume=latest."""
    import signal
    import threading
    import yaml

    import diffsep_tpu.train.loop as loop_mod
    from diffsep_tpu.cli.loading import _config_from_hparams
    from diffsep_tpu.data.datamodule import WSJ0_mix_Module
    from diffsep_tpu.model import DiffSepModel
    from diffsep_tpu.train.loop import fit

    with open(trained_run_dir / "hparams.yaml") as f:
        cfg = _config_from_hparams(yaml.safe_load(f))
    model = DiffSepModel(cfg)
    dm = WSJ0_mix_Module(cfg, pad_to_multiple=int(cfg.model.fs))
    workdir = tmp_path / "preempt_run"
    prior_handler = signal.getsignal(signal.SIGTERM)

    def killer():
        # deterministic: wait until fit() has installed its handler, let a
        # few steps run, then deliver the signal to our own process
        for _ in range(2400):  # <= 2 min, way past any compile stall
            if signal.getsignal(signal.SIGTERM) is loop_mod._on_preempt_signal:
                break
            time.sleep(0.05)
        time.sleep(0.5)
        os.kill(os.getpid(), signal.SIGTERM)

    t = threading.Thread(target=killer, daemon=True)
    t.start()
    budget = 2000  # backstop only — preemption must stop the run long before
    state = fit(
        model, dm, workdir,
        max_epochs=budget, max_steps=budget,
        check_val_every_n_epoch=10**6,  # no epoch-boundary saves
        n_devices=1,
    )
    t.join(timeout=60)
    saved_step = int(state.step)
    assert 0 < saved_step < budget, saved_step
    # the outcome is exposed so cli/train.py can skip the post-train test
    # eval (minutes of inference the SIGTERM grace window does not have)
    assert loop_mod.LAST_FIT_PREEMPTED is True
    # the ONLY checkpoint is the preemption save, at the step fit returned
    steps = sorted(
        int(p.name) for p in (workdir / "checkpoints").iterdir()
        if p.name.isdigit()
    )
    assert steps == [saved_step], (steps, saved_step)
    # no metrics -> the preemption checkpoint must never become best-model
    assert not (workdir / "checkpoints" / "best-model").exists()
    # fit restored the previous SIGTERM disposition on the way out
    assert signal.getsignal(signal.SIGTERM) is prior_handler
    # in-place restart, as a preempted-and-rescheduled job would run it
    state2 = fit(
        model, dm, workdir,
        max_epochs=budget, max_steps=saved_step + 2,
        check_val_every_n_epoch=10**6,
        n_devices=1, resume="latest",
    )
    assert int(state2.step) == saved_step + 2
    # a normally-completed fit resets the preemption outcome
    assert loop_mod.LAST_FIT_PREEMPTED is False


def test_resume_from_checkpoint(trained_run_dir, wsj0_tree):
    """Checkpoint restore round-trips the full TrainState."""
    import jax
    import jax.numpy as jnp
    import yaml

    from diffsep_tpu.cli.loading import _config_from_hparams
    from diffsep_tpu.model import DiffSepModel
    from diffsep_tpu.train.checkpoints import CheckpointManager

    with open(trained_run_dir / "hparams.yaml") as f:
        cfg = _config_from_hparams(yaml.safe_load(f))
    model = DiffSepModel(cfg)
    mix0 = jnp.zeros((1, 1, 4000))
    tgt0 = jnp.zeros((1, 2, 4000))
    state = model.init_state(jax.random.PRNGKey(1), mix0, tgt0)
    mgr = CheckpointManager(trained_run_dir / "checkpoints", best_symlink=False)
    restored = mgr.restore(jax.device_get(state))
    assert int(restored.step) >= 1
    assert int(restored.ema.num_updates) == int(restored.step)
    mgr.close()


def test_test_only_run_uses_fresh_weights(wsj0_tree, tmp_path_factory):
    """train=false test=true must evaluate under freshly initialized
    weights (the reference's 'test with current model value' fallback,
    train.py:150-155) instead of crashing on params=None."""
    from diffsep_tpu.cli.train import main

    exp_root = tmp_path_factory.mktemp("exp_testonly")
    main(
        _tiny_overrides(wsj0_tree, exp_root)
        + ["train=false", "test=true", "model.sampler.N=1"]
    )
    runs = sorted((exp_root / "default").iterdir())
    assert runs
    res_dir = runs[-1] / "test_results"
    files = list(res_dir.glob("*test*.json"))
    assert files, f"no test result files in {res_dir}"
    data = json.loads(
        [f for f in files if "summary" not in f.name][0].read_text()
    )
    rows = list(data.values()) if isinstance(data, dict) else data
    assert rows and all(np.isfinite(r["si_sdr"]).all() for r in rows)


def test_load_pretrained_warm_start_cli(trained_run_dir, wsj0_tree,
                                        tmp_path_factory):
    """cfg.load_pretrained through the train CLI (reference train.py:25-83,
    realized intent — the reference's own implementation is broken in both
    branches, pinned in test_load_pretrained.py): the pretrained run's
    score_model architecture is merged into the new run's config (a
    conflicting nf override loses to the pretrained architecture so the
    weights fit), the weights warm-start training, and the new run trains
    and checkpoints normally."""
    import yaml

    from diffsep_tpu.cli.train import main

    exp_root = tmp_path_factory.mktemp("warm_exp")
    main(
        _tiny_overrides(wsj0_tree, exp_root)
        + [
            f"load_pretrained={trained_run_dir}",
            # conflicts with the pretrained nf=8 on purpose: the merge must
            # adopt the pretrained architecture or loading would fail
            "model.score_model.backbone_args.nf=16",
            "trainer.max_steps=1",
        ]
    )
    runs = sorted((exp_root / "default").iterdir())
    assert runs, "no run dir created"
    with open(runs[-1] / "hparams.yaml") as f:
        hp = yaml.safe_load(f)["config"]
    assert hp["model"]["score_model"]["backbone_args"]["nf"] == 8
    ckpts = runs[-1] / "checkpoints"
    assert any(p.name.isdigit() for p in ckpts.iterdir())


def test_distill_cli(trained_run_dir, tmp_path):
    """diffsep-distill end-to-end: distill the trained run into a 2-step
    DDIM student; the stage dir is a self-contained run dir whose config
    pins the serving sampler, so the standard loader + separate() run the
    student with no flags (train/distill.py math pinned in
    test_distill.py)."""
    import jax
    import jax.numpy as jnp

    from diffsep_tpu.cli.distill import main
    from diffsep_tpu.cli.loading import load_model

    out = tmp_path / "distilled"
    rc = main(
        [
            str(trained_run_dir),
            "--stages", "2",
            "--steps", "2",
            "--out", str(out),
            "--log-every", "0",
        ]
    )
    assert rc == 0
    stage = out / "N2"
    assert (stage / "hparams.yaml").exists()

    model, params = load_model(stage)
    assert model.sampler_kwargs == {
        "predictor_name": "ddim", "corrector_name": "none", "N": 2,
    }
    rng = np.random.default_rng(5)
    mix = jnp.asarray(0.1 * rng.standard_normal((1, 1, 4000)), jnp.float32)
    est, nfe = model.separate(params, jax.random.PRNGKey(0), mix)
    assert nfe == 2  # ddim/none at N=2: one NN eval per step
    assert est.shape == (1, 2, 4000)
    assert np.all(np.isfinite(np.asarray(est)))
