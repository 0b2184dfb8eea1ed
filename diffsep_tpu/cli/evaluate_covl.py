"""CSIG/CBAK/COVL composite evaluation CLI.

Capability parity with evaluate_covl.py:386-474: walks a folder of clean
wavs, pairs each `NNNN.tgtC.wav` with `NNNN.enhC.wav` in the enhanced
folder, computes the Hu & Loizou composites in a host pool, and writes
`{split}_covl.json` + `{split}_summary_covl.json` two levels up from the
enhanced folder.
"""
from __future__ import annotations

import argparse
import json
import logging
import os
from pathlib import Path

import numpy as np

from ..data.audio_io import load_wav
from ..models.composite import eval_composite
from ..utils import ProcessingPool
from .eval_common import summarize_mp

log = logging.getLogger(__name__)


def filename_tgt2enh(tgt_path: Path, enhanced_path: Path):
    """NNNN.tgtC.wav -> (NNNN, C, enhanced/NNNN.enhC.wav)
    (evaluate_covl.py:412-417)."""
    sample_idx, channel = tgt_path.stem.split(".")
    sample_idx = int(sample_idx)
    channel_idx = int(channel[3:])
    return sample_idx, channel_idx, enhanced_path / f"{sample_idx:04d}.enh{channel_idx}.wav"


def compute_one(sample_idx, channel_idx, clean_f, enh_f, sr):
    clean, fs_c = load_wav(clean_f)
    enh, fs_e = load_wav(enh_f)
    res = eval_composite(clean[0], enh[0], fs=sr)
    return sample_idx, channel_idx, res


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(
        description="Compute COVL, CSIG, and CBAK metrics from Hu and Loizou"
    )
    parser.add_argument("clean_path", type=Path, help="Path to folder of clean files")
    parser.add_argument(
        "enhanced_path", type=Path, help="Path to folder of enhanced files"
    )
    parser.add_argument("--sr", type=int, default=16000)
    args = parser.parse_args(argv)

    split = args.enhanced_path.name
    output_path = args.enhanced_path.parents[1]

    n_submitted = 0
    with ProcessingPool(os.cpu_count()) as pool:
        for clean_f in sorted(args.clean_path.rglob("*.wav")):
            sample_idx, channel_idx, enh_f = filename_tgt2enh(
                clean_f, args.enhanced_path
            )
            n_submitted += 1
            pool.push(compute_one, sample_idx, channel_idx, clean_f, enh_f, args.sr)
        results = pool.wait_results(progress_bar=True)

    n_ok = sum(1 for r in results if r)
    if n_ok < n_submitted:
        # a worker exception (e.g. missing enhanced file) yields a None
        # result; without this the summary would silently cover a shrunken
        # population
        log.warning(
            "%d/%d pairs failed (missing/corrupt enhanced files?) — "
            "summary covers the remaining %d",
            n_submitted - n_ok, n_submitted, n_ok,
        )

    output = {}
    for item in sorted((r for r in results if r), key=lambda x: tuple(x[:2])):
        sample_idx, channel_idx, res = item
        entry = output.setdefault(sample_idx, {})
        for met in ("csig", "cbak", "covl"):
            entry.setdefault(met, []).append(res[met])

    # reference semantics (evaluate_covl.py:15,469): evaluate_mp's summarize
    # over the dict-keyed output at its default ignore_inf=True
    summary = summarize_mp(output)
    log.info("%s", summary)

    with open(output_path / f"{split}_covl.json", "w") as f:
        json.dump(output, f, indent=2)
    with open(output_path / f"{split}_summary_covl.json", "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
