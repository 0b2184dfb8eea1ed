"""Composite-metrics CLI parity: OUR `evaluate_covl.py` vs the reference's
`/root/reference/evaluate_covl.py` run in-process as __main__ over the same
clean/enhanced wav folders.

The composite MATH (wss/llr/ssnr/lpcoeff) is already golden-pinned against
the reference functions in test_composite_golden.py; what only the CLI run
pins is the orchestration: the NNNN.tgtC.wav -> NNNN.enhC.wav pairing
(evaluate_covl.py:411-417), the per-sample channel-list accumulation in
sorted order (:457-467), the trim_mos'd csig/cbak/covl record values, the
dict-keyed {split}_covl.json written two levels above the enhanced dir,
and the evaluate_mp-summarize summary (:15,469).

The reference's utils.ProcessingPool would spawn OS workers that cannot
re-import a runpy __main__; since --workers-style control doesn't exist
here, the pool class is replaced on the (already imported) reference utils
module with a synchronous stand-in — parallelism backend defused,
semantics untouched.  librosa.load is stubbed on scipy with peak-float
normalization; pesq routes to our native implementation on BOTH sides (as
in the other CLI parity suites, this pins the plumbing, not the metric
internals).
"""
import csv
import json
import runpy
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REF / "evaluate_covl.py").exists(),
    reason="reference checkout not available",
)

from tests.test_evaluate_cli_reference_parity import (  # noqa: E402
    _install_metric_stubs,
    _write_wav,
)
from tests.test_reference_pipeline_parity import (  # noqa: E402
    _install_hydra_stub,
    _install_ref_pl_stubs,
    _install_torchaudio_stub,
)


class _SyncPool:
    """Synchronous stand-in for the reference utils.ProcessingPool —
    same push/wait_results surface, no processes."""

    def __init__(self, *a, **k):
        self._results = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def push(self, fn, args):
        self._results.append(fn(*args))

    def wait_results(self, progress_bar=False):
        return self._results, len(self._results)


def _install_librosa_stub():
    lb = sys.modules.setdefault("librosa", types.ModuleType("librosa"))
    lb.__diffsep_test_stub__ = True  # popped by conftest's containment
    if not hasattr(lb, "load"):
        def load(path, sr=None):
            from scipy.io import wavfile

            fs, data = wavfile.read(str(path))
            if data.dtype == np.int16:
                data = data.astype(np.float32) / 32768.0
            else:
                data = data.astype(np.float32)
            assert sr is None or sr == fs, "stub: no resampling"
            return data, fs

        lb.load = load


def _run_reference_covl(clean_dir, enh_dir):
    _install_torchaudio_stub()
    _install_hydra_stub()
    _install_ref_pl_stubs()
    _install_metric_stubs()
    _install_librosa_stub()
    sys.path.insert(0, str(REF))
    try:
        import utils as ref_utils  # the reference's own utils package

        old_pool = ref_utils.ProcessingPool
        ref_utils.ProcessingPool = _SyncPool
        old_argv = sys.argv
        sys.argv = ["evaluate_covl.py", str(clean_dir), str(enh_dir)]
        try:
            runpy.run_path(str(REF / "evaluate_covl.py"),
                           run_name="__main__")
        finally:
            sys.argv = old_argv
            ref_utils.ProcessingPool = old_pool
    finally:
        sys.path.remove(str(REF))


def _make_pairs(base, n_samples=2, n_ch=2, fs=16000, seconds=2.0):
    """results/<tag>/wav/test layout the covl tool expects: clean targets
    NNNN.tgtC.wav next to enhanced NNNN.enhC.wav."""
    clean = base / "clean"
    enh = base / "results" / "tag" / "wav" / "test"
    rng = np.random.default_rng(31)
    t = np.arange(int(fs * seconds)) / fs
    for i in range(n_samples):
        for c in range(n_ch):
            x = 0.3 * np.sin(2 * np.pi * (200 + 50 * i + 25 * c) * t)
            x += 0.01 * rng.standard_normal(t.size)
            y = x + 0.05 * rng.standard_normal(t.size)
            _write_wav(clean / f"{i:04d}.tgt{c}.wav", x, fs=fs)
            _write_wav(enh / f"{i:04d}.enh{c}.wav", y, fs=fs)
    return clean, enh


def test_evaluate_covl_cli_end_to_end_parity(tmp_path):
    ref_clean, ref_enh = _make_pairs(tmp_path / "ref")
    our_clean, our_enh = _make_pairs(tmp_path / "ours")

    _run_reference_covl(ref_clean, ref_enh)

    from diffsep_tpu.cli import evaluate_covl as our_covl

    our_covl.main([str(our_clean), str(our_enh)])

    ref_res = json.loads(
        (ref_enh.parents[1] / "test_covl.json").read_text()
    )
    our_res = json.loads(
        (our_enh.parents[1] / "test_covl.json").read_text()
    )
    assert sorted(ref_res.keys()) == sorted(our_res.keys())
    for k in ref_res:
        assert set(ref_res[k].keys()) == set(our_res[k].keys()) == {
            "csig", "cbak", "covl"
        }
        for met in ("csig", "cbak", "covl"):
            assert len(ref_res[k][met]) == len(our_res[k][met]) == 2
            np.testing.assert_allclose(
                our_res[k][met], ref_res[k][met], rtol=1e-4, atol=1e-4,
                err_msg=f"{met} (sample {k})",
            )

    ref_sum = json.loads(
        (ref_enh.parents[1] / "test_summary_covl.json").read_text()
    )
    our_sum = json.loads(
        (our_enh.parents[1] / "test_summary_covl.json").read_text()
    )
    assert set(ref_sum.keys()) == set(our_sum.keys())
    for met in ref_sum:
        np.testing.assert_allclose(
            our_sum[met], ref_sum[met], rtol=1e-4, atol=1e-4, err_msg=met
        )
