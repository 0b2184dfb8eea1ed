"""Export a trained model to a self-contained serving artifact.

    python -m diffsep_tpu.cli.export_model exp/.../<run> -o model.dsx \
        --batch 8 --len-s 5 -N 6 --predictor dpmpp --corrector none

The artifact bakes the evaluation (EMA) weights and the ENTIRE reverse
process into one multi-platform StableHLO module (diffsep_tpu/export.py);
`diffsep_tpu.export.load_separator("model.dsx").call(seed, mix)` serves it
with no config, checkpoint, or model code. Accepts the same checkpoint
flavors as separate.py (run dir, orbax step dir, reference .ckpt).

No reference equivalent: its serving path re-instantiates the Python model
from hydra config on every host (/root/reference/separate.py:49-75).
"""
from __future__ import annotations

import argparse
import logging
from pathlib import Path


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("ckpt", type=Path, help="run dir / step dir / .ckpt")
    parser.add_argument("-o", "--output", type=Path, required=True)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument(
        "--len-s", type=float, default=5.0,
        help="utterance length in seconds (static shape)",
    )
    parser.add_argument("-N", type=int, default=None, help="sampler steps")
    parser.add_argument("--predictor", type=str, default=None)
    parser.add_argument("--corrector", type=str, default=None)
    parser.add_argument("--corrector-steps", type=int, default=None)
    parser.add_argument("--snr", type=float, default=None)
    parser.add_argument("--schedule", type=str, default=None)
    parser.add_argument(
        "--platforms", type=str, default="cpu,tpu",
        help="comma-separated lowering targets",
    )
    parser.add_argument("--step", type=int, default=None)
    parser.add_argument(
        "--avg-last-k", type=int, default=None,
        help="average the evaluation weights of the k most recent "
        "checkpoints (checkpoint averaging) before exporting",
    )
    parser.add_argument(
        "--torch", action="store_true",
        help="write a reference-compatible PyTorch .ckpt instead of a "
        "StableHLO artifact: the evaluation (EMA) weights as "
        "`state_dict['score_model.*']` + the run config under "
        "`hyper_parameters.config` with reference `_target_` paths, so "
        "the torch reference can evaluate weights trained here "
        "(models/convert.py:save_reference_checkpoint)",
    )
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from .loading import load_model
    from ..export import export_separator

    model, params = load_model(
        args.ckpt, step=args.step, avg_last_k=args.avg_last_k
    )

    if args.torch:
        from .eval_common import reject_baked_flags, sampler_flag_map

        reject_baked_flags(
            sampler_flag_map(args),
            "sampler flags do not apply to --torch (the reference chooses "
            "its sampler at run time)",
        )
        from ..models.convert import save_reference_checkpoint

        save_reference_checkpoint(args.output, params, model.config)
        print(f"wrote reference checkpoint {args.output}")
        return
    fs = int(model.config.model.fs)
    n_samples = int(round(args.len_s * fs))

    kw = {}
    if args.N is not None:
        kw["N"] = args.N
    if args.predictor is not None:
        kw["predictor_name"] = args.predictor
    if args.corrector is not None:
        kw["corrector_name"] = args.corrector
    if args.corrector_steps is not None:
        kw["corrector_steps"] = args.corrector_steps
    if args.snr is not None:
        kw["snr"] = args.snr
    if args.schedule is not None:
        kw["schedule"] = args.schedule

    data = export_separator(
        model, params, args.batch, n_samples,
        out_path=args.output,
        platforms=tuple(p.strip() for p in args.platforms.split(",") if p.strip()),
        **kw,
    )
    print(
        f"wrote {args.output} ({len(data) / 1e6:.1f} MB): "
        f"batch={args.batch} n_samples={n_samples} ({args.len_s}s @ {fs} Hz)"
    )


if __name__ == "__main__":
    main()
