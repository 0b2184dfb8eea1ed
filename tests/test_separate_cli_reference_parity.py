"""Folder-to-folder inference CLI parity: OUR `separate.py` vs the
reference's `/root/reference/separate.py`, both run as real CLIs over the
same wav folder with the same converted weights and zero-noise sampling.

What only this level can pin: checkpoint resolution (local path vs HF hub
fallback), the normalize -> sample -> scale_output composition
(separate.py:81-97 — the estimate is NOT denormalized; the raw mixture is
least-squares-projected onto the normalized-domain estimate), the
config-vs-CLI sampler merge, and the s{i}/{stem}.wav output layout.

Upstream defect pinned by execution: the sample-rate check prints
"Skipping ..." but has no `continue` (separate.py:146-151) — a mismatched
file is separated anyway at the wrong rate and saved under the file's own
rate. Our CLI actually skips; the defused comparison covers matching-rate
files only.
"""
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
    not (REF / "separate.py").exists(),
    reason="reference checkout not available",
)

from tests.test_evaluate_cli_reference_parity import (  # noqa: E402,F401
    FS,
    N_UTT,
    UTT_LEN,
    _write_wav,
    _zero_noise_both,
    eval_env,
)
from tests.test_reference_pipeline_parity import (  # noqa: E402
    _install_hydra_stub,
    _install_ref_pl_stubs,
    _install_torchaudio_stub,
)


def _install_hf_stub():
    """huggingface_hub.hf_hub_download — imported at module scope
    (separate.py:12) but only called when --model is not a local path."""
    hub = sys.modules.setdefault(
        "huggingface_hub", types.ModuleType("huggingface_hub")
    )
    if not hasattr(hub, "hf_hub_download"):
        def hf_hub_download(repo_id, filename):
            raise RuntimeError(f"no egress (requested {repo_id}/{filename})")

        hub.hf_hub_download = hf_hub_download


def _run_reference_separate(in_dir, out_dir, ckpt, extra_argv=()):
    _install_torchaudio_stub()
    _install_hydra_stub()
    _install_ref_pl_stubs()
    _install_hf_stub()
    sys.modules.pop("pl_model", None)
    argv = [
        "separate.py", str(in_dir), str(out_dir),
        "--model", str(ckpt), "-d", "cpu", *extra_argv,
    ]
    old_argv = sys.argv
    sys.argv = argv
    sys.path.insert(0, str(REF))
    try:
        runpy.run_path(str(REF / "separate.py"), run_name="__main__")
    finally:
        sys.argv = old_argv
        sys.path.remove(str(REF))


def _read(path):
    from scipy.io import wavfile

    fs, data = wavfile.read(str(path))
    if data.dtype == np.int16:
        data = data.astype(np.float64) / 32768.0
    return fs, np.asarray(data, np.float64)


@pytest.fixture()
def wav_folder(tmp_path):
    rng = np.random.default_rng(21)
    t = np.arange(UTT_LEN) / FS
    in_dir = tmp_path / "input"
    for i in range(N_UTT):
        s = 0.3 * np.sin(2 * np.pi * (220 + 60 * i) * t)
        s += 0.25 * np.sin(2 * np.pi * (350 + 40 * i) * t + 0.5)
        s += 0.02 * rng.standard_normal(UTT_LEN)
        _write_wav(in_dir / f"mix{i}.wav", s)
    return in_dir


def test_separate_cli_end_to_end_parity(eval_env, wav_folder, monkeypatch,
                                        tmp_path):
    """Same folder, same converted weights, zero noise, a CLI override
    (N=3): per-source wavs must agree within the cross-framework network
    tolerance, in the reference's s{i}/{stem}.wav layout."""
    _zero_noise_both(monkeypatch)

    ref_out = tmp_path / "ref_out"
    _run_reference_separate(wav_folder, ref_out, eval_env.ckpt, ["-N", "3"])

    from diffsep_tpu import model as model_mod
    from diffsep_tpu.cli import separate as our_sep

    model_mod._jit_pc_sample.clear_cache()
    our_out = tmp_path / "our_out"
    our_sep.main(
        [str(wav_folder), str(our_out), "--model", str(eval_env.ckpt),
         "-N", "3"]
    )

    assert sorted(p.name for p in ref_out.iterdir()) == ["s0", "s1"]
    assert sorted(p.name for p in our_out.iterdir()) == ["s0", "s1"]
    for src in ("s0", "s1"):
        ref_files = sorted((ref_out / src).glob("*.wav"))
        our_files = sorted((our_out / src).glob("*.wav"))
        assert [p.name for p in ref_files] == [p.name for p in our_files]
        assert len(ref_files) == N_UTT
        for rp, op in zip(ref_files, our_files):
            _, r = _read(rp)
            _, o = _read(op)
            assert r.shape == o.shape == (UTT_LEN,)
            scale = max(np.abs(r).max(), 1e-3)
            np.testing.assert_allclose(
                o, r, atol=2e-2 * scale,
                err_msg=f"{src}/{rp.name}",
            )


def test_separate_cli_sr_mismatch_defect(eval_env, wav_folder, monkeypatch,
                                         tmp_path):
    """Upstream defect by execution: a 16 kHz file in an 8 kHz model's
    input folder is reported as skipped but separated anyway
    (separate.py:146-151 — no `continue`), its outputs written at the
    file's own rate.  Our CLI actually skips it."""
    _zero_noise_both(monkeypatch)
    t16 = np.arange(8000) / 16000.0
    _write_wav(wav_folder / "zz16k.wav",
               0.3 * np.sin(2 * np.pi * 300 * t16), fs=16000)

    ref_out = tmp_path / "ref_out"
    _run_reference_separate(wav_folder, ref_out, eval_env.ckpt, ["-N", "2"])
    # the reference DID process the mismatched file
    assert (ref_out / "s0" / "zz16k.wav").exists()
    fs_out, _ = _read(ref_out / "s0" / "zz16k.wav")
    assert fs_out == 16000  # saved at the file's rate, not the model's

    from diffsep_tpu import model as model_mod
    from diffsep_tpu.cli import separate as our_sep

    model_mod._jit_pc_sample.clear_cache()
    our_out = tmp_path / "our_out"
    our_sep.main(
        [str(wav_folder), str(our_out), "--model", str(eval_env.ckpt),
         "-N", "2"]
    )
    # ours skips the mismatched file (deliberate deviation, logged)
    assert not (our_out / "s0" / "zz16k.wav").exists()
    assert (our_out / "s0" / "mix0.wav").exists()
