"""merge_dnsmos CLI parity: OUR merge tool vs the reference's
`/root/reference/merge_dnsmos.py` run in-process as __main__ over the same
result folder — mp-format dict results + a DNSMOS CSV.

Pinned: CSV header validation and per-channel row parsing
(merge_dnsmos.py:53-110), the merge into {split}.json records, the
{split}_with_dnsmos.json / {split}_summary_with_dnsmos.json outputs, and
the summary semantics — evaluate_mp's summarize with ignore_inf=False
(merge_dnsmos.py:146), whose flag IGNORES the inf check rather than
ignoring infs: with False an inf metric is SKIPPED from its own
denominator while every finite metric divides by its full count.  One
record carries an inf si_sdr so that branch is actually exercised.
(The reference also has a `breakpoint()` before its missing-sample
ValueError, merge_dnsmos.py:141 — a debugging leftover; not driven here
because stdin-less pdb behavior is environment-defined.)
"""
import csv
import json
import runpy
import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REF / "merge_dnsmos.py").exists(),
    reason="reference checkout not available",
)

from tests.test_reference_pipeline_parity import (  # noqa: E402
    _install_hydra_stub,
    _install_ref_pl_stubs,
    _install_torchaudio_stub,
)

FIELDNAMES = [
    "", "filename", "len_in_sec", "sr", "num_hops",
    "OVRL_raw", "SIG_raw", "BAK_raw", "OVRL", "SIG", "BAK",
]


def _make_results_dir(base):
    base.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(9)
    results = {}
    for idx in range(3):
        si = [[6.0 + idx, 5.5 + idx]]
        if idx == 1:  # exercise the inf-skip branch of ignore_inf=False
            si = [[float("inf"), 5.5 + idx]]
        results[idx] = {
            "batch_idx": idx,
            "si_sdr": si,
            "pesq": [3.0 + 0.1 * idx, 2.9 + 0.1 * idx],
            "nfe": 60,
            "runtime": 1.5,
            "len_s": 5.0,
        }
    with open(base / "val.json", "w") as f:
        json.dump(results, f, indent=2)

    with open(base / "val_dnsmos.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(FIELDNAMES)
        row_id = 0
        for idx in range(3):
            for ch in range(2):
                w.writerow([
                    row_id, f"wav/val/{idx:04d}.enh{ch}.wav",
                    5.0, 8000, 56,
                    round(2.0 + 0.1 * idx + 0.01 * ch, 3),
                    round(2.5 + 0.1 * idx, 3),
                    round(2.2 + 0.05 * ch, 3),
                    round(2.1 + 0.1 * idx, 3),
                    round(2.6 + 0.1 * idx, 3),
                    round(2.3 + 0.05 * ch, 3),
                ])
                row_id += 1
    return results


def _run_reference_merge(results_dir):
    _install_torchaudio_stub()
    _install_hydra_stub()
    _install_ref_pl_stubs()
    from tests.test_evaluate_cli_reference_parity import _install_metric_stubs

    _install_metric_stubs()
    argv = ["merge_dnsmos.py", str(results_dir)]
    old_argv = sys.argv
    sys.argv = argv
    sys.path.insert(0, str(REF))
    try:
        runpy.run_path(str(REF / "merge_dnsmos.py"), run_name="__main__")
    finally:
        sys.argv = old_argv
        sys.path.remove(str(REF))


def test_merge_dnsmos_end_to_end_parity(tmp_path):
    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    _make_results_dir(ref_dir)
    _make_results_dir(our_dir)

    _run_reference_merge(ref_dir)

    from diffsep_tpu.cli import merge_dnsmos as our_merge

    our_merge.main([str(our_dir)])

    ref_merged = json.loads((ref_dir / "val_with_dnsmos.json").read_text())
    our_merged = json.loads((our_dir / "val_with_dnsmos.json").read_text())
    assert sorted(ref_merged.keys()) == sorted(our_merged.keys())
    for k in ref_merged:
        r, o = ref_merged[k], our_merged[k]
        assert set(r.keys()) == set(o.keys()), (k, r.keys(), o.keys())
        for met in ("OVRL", "SIG", "BAK", "OVRL_raw", "SIG_raw", "BAK_raw",
                    "len_in_sec", "sr", "num_hops"):
            assert r[met] == o[met], (k, met)

    ref_sum = json.loads(
        (ref_dir / "val_summary_with_dnsmos.json").read_text()
    )
    our_sum = json.loads(
        (our_dir / "val_summary_with_dnsmos.json").read_text()
    )
    assert set(ref_sum.keys()) == set(our_sum.keys())
    for met in ref_sum:
        if met == "filename":
            continue
        np.testing.assert_allclose(
            our_sum[met], ref_sum[met], rtol=1e-9, err_msg=met
        )
    # the inf record was skipped from si_sdr's denominator (2 not 3) while
    # pesq divides by 3 — the ignore_inf=False semantics: records 0 and 2
    # have si_sdr means (6.0+5.5)/2 = 5.75 and (8.0+7.5)/2 = 7.75
    np.testing.assert_allclose(ref_sum["si_sdr"], (5.75 + 7.75) / 2)


def test_merge_dnsmos_header_validation(tmp_path):
    """Both tools reject a CSV whose header is not DNSMOS's
    (merge_dnsmos.py:63-68)."""
    base = tmp_path / "r"
    _make_results_dir(base)
    (base / "val_dnsmos.csv").write_text("bogus,header\n1,2\n")
    from diffsep_tpu.cli import merge_dnsmos as our_merge

    with pytest.raises(ValueError, match="DNSMOS"):
        our_merge.main([str(base)])
    with pytest.raises(ValueError, match="DNSMOS"):
        _run_reference_merge(base)
