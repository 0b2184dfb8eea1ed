"""Sharded-evaluation CLI parity: OUR `evaluate_mp.py` vs the reference's
`/root/reference/evaluate_mp.py` — the tool that actually produced the
paper's test numbers (the single-process evaluate.py --test path is broken
upstream, see test_evaluate_cli_reference_parity).

The reference is run as a real CLI via runpy with `--workers 0`, its own
in-process execution mode (evaluate_mp.py:505-508) — no torch
multiprocessing needed — over the same synthetic WSJ0 tree, converted
weights, and zero noise.  Pinned: the task split + per-index records, the
DICT-keyed {split}.json schema (evaluate_mp.py:282,515-520), the
inf-aware summary variant with its per-metric denominators
(evaluate_mp.py:133-151), and the `{exp_name}_{ckpt_name}_{tag_inf}`
output dirname (evaluate_mp.py:448-455).
"""
import json
import runpy
import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REF / "evaluate_mp.py").exists(),
    reason="reference checkout not available",
)

from tests.test_evaluate_cli_reference_parity import (  # noqa: E402,F401
    N_UTT,
    UTT_LEN,
    FS,
    _install_metric_stubs,
    _zero_noise_both,
    eval_env,
)
from tests.test_reference_pipeline_parity import (  # noqa: E402
    _install_hydra_stub,
    _install_ref_pl_stubs,
    _install_torchaudio_stub,
)


def _run_reference_mp(ckpt, out_dir, extra_argv=(), cwd=None):
    """cwd: directory to run from — the script loads
    config/datamodule/default.yaml RELATIVE to the CWD
    (evaluate_mp.py:28-39), i.e. it must run from a reference-shaped root;
    the wrapper builds one with a config symlink when not given."""
    import os
    import tempfile

    _install_torchaudio_stub()
    _install_hydra_stub()
    _install_ref_pl_stubs()
    _install_metric_stubs()
    sys.modules.pop("pl_model", None)
    if cwd is None:
        cwd = Path(tempfile.mkdtemp(prefix="refmp_cwd_"))
    cwd = Path(cwd)
    if not (cwd / "config").exists():
        (cwd / "config").symlink_to(REF / "config")
    old_cwd = os.getcwd()
    os.chdir(cwd)
    argv = [
        "evaluate_mp.py", str(ckpt), "-o", str(out_dir),
        "--workers", "0", "--dl-workers", "0", "-d", "cpu",
        "--save-n", "0", *extra_argv,
    ]
    import torch.multiprocessing as tmp_mod

    old_argv = sys.argv
    sys.argv = argv
    sys.path.insert(0, str(REF))
    # the script sets the start method unconditionally (evaluate_mp.py:339);
    # the context is already initialized in this test process, and with
    # --workers 0 nothing ever spawns — no-op it for the run
    old_ssm = tmp_mod.set_start_method
    tmp_mod.set_start_method = lambda *a, **k: None
    try:
        runpy.run_path(str(REF / "evaluate_mp.py"), run_name="__main__")
    finally:
        sys.argv = old_argv
        sys.path.remove(str(REF))
        tmp_mod.set_start_method = old_ssm
        os.chdir(old_cwd)


def test_evaluate_mp_cli_end_to_end_parity(eval_env, monkeypatch, tmp_path):
    """Both sharded-eval CLIs over the same val split, zero noise, CLI
    N-override: dict-keyed records, summaries (inf-aware variant), and the
    experiment-tagged dirname must agree."""
    _zero_noise_both(monkeypatch)

    ref_out = tmp_path / "ref_results"
    _run_reference_mp(eval_env.ckpt, ref_out, ["--splits", "val", "-N", "3"])

    from diffsep_tpu import model as model_mod
    from diffsep_tpu.cli import evaluate_mp as our_mp

    model_mod._jit_pc_sample.clear_cache()
    our_out = tmp_path / "our_results"
    our_mp.main(
        [str(eval_env.ckpt), "-o", str(our_out), "--splits", "val",
         "-N", "3"]
    )

    ref_dirs = sorted(p.name for p in ref_out.iterdir())
    our_dirs = sorted(p.name for p in our_out.iterdir())
    assert ref_dirs == our_dirs, (ref_dirs, our_dirs)

    ref_recs = json.loads((ref_out / ref_dirs[0] / "val.json").read_text())
    our_recs = json.loads((our_out / our_dirs[0] / "val.json").read_text())
    # DICT keyed by sample index, stringified by JSON — on both sides
    assert isinstance(ref_recs, dict) and isinstance(our_recs, dict)
    assert sorted(ref_recs.keys()) == sorted(our_recs.keys())
    assert len(ref_recs) == N_UTT

    for k in ref_recs:
        r, o = ref_recs[k], our_recs[k]
        assert list(r.keys()) == list(o.keys()), (r.keys(), o.keys())
        assert r["batch_idx"] == o["batch_idx"] == int(k)
        assert r["nfe"] == o["nfe"] == 3 * 2
        assert r["len_s"] == o["len_s"] == UTT_LEN / FS
        for met in ("si_sdr", "si_sir", "si_sar", "pesq", "stoi"):
            np.testing.assert_allclose(
                np.asarray(o[met], np.float64),
                np.asarray(r[met], np.float64),
                atol=0.1, rtol=1e-3,
                err_msg=f"{met} diverged (rec {k})",
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


def test_evaluate_mp_no_proc_sentinel_parity(eval_env, monkeypatch,
                                             tmp_path):
    """__no_proc__ through the mp tool (evaluate_mp.py:165-171,425-429):
    unlike evaluate.py's sentinel (which dies on the undefined n_src),
    the mp tool's sentinel RUNS upstream — deterministic, so exact schema
    and tight values.  Scores wav16k (WSJ0_mix default fs)."""
    from tests.test_evaluate_cli_reference_parity import _write_wav

    monkeypatch.chdir(tmp_path)
    root16 = tmp_path / "wsj16"
    t16 = np.arange(2 * 16000) / 16000.0
    rng = np.random.default_rng(5)
    for i in range(N_UTT):
        s1 = 0.3 * np.sin(2 * np.pi * (210 + 60 * i) * t16)
        s1 += 0.02 * rng.standard_normal(t16.size)
        s2 = 0.24 * np.sin(2 * np.pi * (340 + 45 * i) * t16)
        s2 += 0.02 * rng.standard_normal(t16.size)
        cv = root16 / "2speakers" / "wav16k" / "max" / "cv"
        _write_wav(cv / "s1" / f"u{i}.wav", s1, fs=16000)
        _write_wav(cv / "s2" / f"u{i}.wav", s2, fs=16000)
        _write_wav(cv / "mix" / f"u{i}.wav", s1 + s2, fs=16000)
    (tmp_path / "data").mkdir()
    (tmp_path / "data" / "wsj0_mix").symlink_to(root16)

    ref_cwd = tmp_path / "refcwd"
    ref_cwd.mkdir()
    (ref_cwd / "data").symlink_to(tmp_path / "data")
    ref_out = tmp_path / "ref_results"
    _run_reference_mp("__no_proc__", ref_out, ["--splits", "val"],
                      cwd=ref_cwd)

    from diffsep_tpu.cli import evaluate_mp as our_mp

    our_out = tmp_path / "our_results"
    our_mp.main(["__no_proc__", "-o", str(our_out), "--splits", "val"])

    ref_recs = json.loads((ref_out / "mix" / "val.json").read_text())
    our_recs = json.loads((our_out / "mix" / "val.json").read_text())
    assert sorted(ref_recs.keys()) == sorted(our_recs.keys())
    assert len(ref_recs) == N_UTT
    for k in ref_recs:
        r, o = ref_recs[k], our_recs[k]
        assert list(r.keys()) == list(o.keys())
        assert r["nfe"] == o["nfe"] == 0
        for met in ("si_sdr", "si_sir", "si_sar", "pesq", "stoi"):
            np.testing.assert_allclose(
                np.asarray(o[met], np.float64),
                np.asarray(r[met], np.float64),
                atol=1e-3, rtol=1e-5, err_msg=met,
            )
