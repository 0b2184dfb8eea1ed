#!/usr/bin/env python
"""Real-weights SI-SDR parity harness for WSJ0-2mix (VERDICT round-1 item 5).

One command that, when network + data are available:
  1. downloads the published `fakufaku/diffsep` checkpoint.pt from the
     HuggingFace Hub (reference separate.py:36-44 contract),
  2. converts it (torch Lightning -> flax, EMA shadow weights),
  3. runs evaluate on the WSJ0-2mix test split (or --limit subset),
  4. asserts |mean SI-SDR - expected| <= --tol dB.

In this zero-egress build environment, step 1 fails with a clear message;
the full pipeline from a LOCAL checkpoint file + local dataset is exercised
end-to-end by tests/test_parity_harness.py with synthetic stand-ins.

Expected values (provenance):
  * 9.6 dB  — WSJ0-2mix test SI-SDR reported for DiffSep in the ICASSP 2023
              paper (arXiv:2210.17327, Table 1); transcribed from memory,
              NOT yet re-checked against the PDF (zero egress) — confirm and
              re-pin on first networked run.
  * 10.965 dB — val split SI-SDR embedded in the reference's own checkpoint
              filename (reference figure_reverse_diffusion_example.py:33-36);
              applies with --split val.

Usage:
  python scripts/parity_wsj0.py --data-root /path/to/wsj0_mix \
      [--model fakufaku/diffsep | --model /path/to/checkpoint.pt] \
      [--limit 100] [--expected 9.6] [--tol 0.1] [--sweep-ddim]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def run_eval(ckpt_path, data_root, out_dir, limit, split, extra=()):
    """Drive cli.evaluate exactly as the CLI would."""
    from diffsep_tpu.cli import evaluate as ev

    argv = [
        str(ckpt_path),
        f"--{split}",
        "-o", str(out_dir),
        "--tag", f"parity_{split}",
    ]
    if limit:
        argv += ["--limit", str(limit)]
    argv += list(extra)

    # point the dataset resolution at --data-root: evaluate falls back to
    # ./data/wsj0_mix when the checkpoint's recorded path is absent
    import os

    if data_root is not None:
        target = Path(data_root).resolve()
        link = Path("data/wsj0_mix")
        if link.is_symlink():
            if link.resolve() != target:
                os.remove(link)  # stale link from a previous --data-root
                os.symlink(target, link)
        elif link.exists():
            if link.resolve() != target:
                raise FileExistsError(
                    f"data/wsj0_mix exists and is not --data-root ({target}); "
                    "refusing to evaluate against the wrong dataset"
                )
        else:
            link.parent.mkdir(parents=True, exist_ok=True)
            os.symlink(target, link)
    ev.main(argv)
    # find the summary the run wrote
    summaries = sorted(Path(out_dir).glob(f"parity_{split}*/{split}_summary.json"))
    if not summaries:
        raise FileNotFoundError(f"no {split}_summary.json under {out_dir}")
    with open(summaries[-1]) as f:
        return json.load(f)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model", default="fakufaku/diffsep",
                    help="HF repo id or local checkpoint.pt path")
    ap.add_argument("--data-root", default=None,
                    help="WSJ0-2mix root (containing 2speakers/wav8k/...)")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--split", choices=["val", "test"], default="test")
    ap.add_argument("--expected", type=float, default=9.6,
                    help="expected mean SI-SDR (dB); see provenance in the "
                    "module docstring")
    ap.add_argument("--tol", type=float, default=0.1)
    ap.add_argument("--output-dir", type=Path, default=Path("results/parity"))
    ap.add_argument("--sweep-ddim", action="store_true",
                    help="additionally sweep the fast DDIM sampler at "
                    "N in {3, 6, 12} and print the quality/N curve")
    ap.add_argument("--trust-pinned", action="store_true",
                    help="accept the from-memory default --expected value; "
                    "without this flag the harness refuses to declare PASS "
                    "against an unverified expectation")
    args = ap.parse_args(argv)

    from diffsep_tpu.cli.separate import resolve_model_path

    ckpt = resolve_model_path(args.model)  # downloads from HF if needed
    print(f"checkpoint: {ckpt}")

    summary = run_eval(ckpt, args.data_root, args.output_dir, args.limit, args.split)
    si_sdr = summary["si_sdr"]  # summarize() emits flat per-metric means
    delta = si_sdr - args.expected

    # the shipped default expectation (9.6 dB) was transcribed from memory
    # of the paper's Table 1 and never re-checked against the PDF (see
    # module docstring); a "PASS" against an unverified number is not a
    # parity claim, so refuse it unless the caller opts in
    default_expected = ap.get_default("expected")
    unverified = (
        args.expected == default_expected and not args.trust_pinned
    )
    report = {
        "split": args.split,
        "si_sdr_mean": si_sdr,
        "expected": args.expected,
        "delta_db": delta,
        "pass": (abs(delta) <= args.tol) and not unverified,
        "n_utts": summary.get("number", None),
    }
    if unverified:
        report["expected_provenance"] = "UNVERIFIED (from-memory default)"

    if args.sweep_ddim:
        report["ddim_sweep"] = {}
        for n in (3, 6, 12):
            s = run_eval(
                ckpt, args.data_root, args.output_dir / f"ddim{n}",
                args.limit, args.split,
                extra=["--predictor", "ddim", "--corrector", "none", "-N", str(n)],
            )
            # record the full quality picture at each N, not just SI-SDR
            report["ddim_sweep"][f"N={n}"] = {
                k: s[k]
                for k in ("si_sdr", "pesq", "pesq_wb", "stoi", "estoi")
                if k in s
            }

    print(json.dumps(report, indent=2))
    if unverified:
        print(
            "REFUSING to declare PASS: --expected is the from-memory default "
            f"({default_expected} dB). Re-pin it from arXiv:2210.17327 "
            "Table 1 and pass --expected <value>, or pass --trust-pinned "
            "to accept the unverified number.",
            file=sys.stderr,
        )
        sys.exit(2)
    if not report["pass"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
