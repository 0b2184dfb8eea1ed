"""Folder-to-folder separation CLI.

Capability parity with the reference separate.py: iterates `*.wav` in the
input folder, separates each with the PC sampler, least-squares-projects the
estimates onto the mixture scale (separate.py:73-78), and writes
`s{i}/{stem}.wav` per source (separate.py:155-162). Supports reference
PyTorch checkpoints (HF `fakufaku/diffsep` checkpoint.pt downloaded
beforehand) and diffsep_tpu run dirs.
"""
from __future__ import annotations

import argparse
import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from ..data.audio_io import load_wav, save_wav
from .eval_common import str2bool
from .loading import load_model

DEFAULT_MODEL = "fakufaku/diffsep"

log = logging.getLogger(__name__)

from ..compilation_cache import enable as _enable_cache

_enable_cache()


def resolve_model_path(model) -> Path:
    """Reference CLI contract (separate.py:36-44): a --model that is not a
    local path is treated as a HuggingFace Hub repo id and checkpoint.pt is
    downloaded. Falls back to an actionable error when the hub is
    unreachable (this build environment has zero egress)."""
    model = Path(model)
    if model.exists():
        return model
    try:
        from huggingface_hub import hf_hub_download

        return Path(hf_hub_download(repo_id=str(model), filename="checkpoint.pt"))
    except Exception as e:
        raise FileNotFoundError(
            f"Model '{model}' is not a local path and downloading it from "
            f"the HuggingFace Hub failed ({type(e).__name__}: {e}). If this "
            f"environment has no network access, download the checkpoint "
            f"('{DEFAULT_MODEL}', file checkpoint.pt) elsewhere and pass "
            "its path via --model."
        ) from e


def scale_output(mix, sep):
    """Project the mixture onto each separated signal (separate.py:73-78)."""
    num = (mix * sep).sum(axis=-1, keepdims=True)
    denom = (sep * sep + 1e-10).sum(axis=-1, keepdims=True)
    return num / denom * sep


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Separate all the wav files in a specified folder"
    )
    parser.add_argument("input_dir", type=Path, help="Path to the input folder")
    parser.add_argument("output_dir", type=Path, help="Path to the output folder")
    parser.add_argument(
        "--model",
        type=Path,
        default=Path(DEFAULT_MODEL),
        help="Path to a checkpoint (torch .pt/.ckpt or diffsep_tpu run dir)",
    )
    parser.add_argument("-N", type=int, default=None, help="Number of steps")
    parser.add_argument("--snr", type=float, default=None, help="Corrector snr")
    parser.add_argument(
        "--corrector-steps", type=int, default=None, help="Number of corrector steps"
    )
    parser.add_argument(
        "--denoise", type=str2bool, default=None,
        help="Use denoising in solver (true/false; default true)"
    )
    parser.add_argument(
        "-s", "--schedule", type=str, default=None,
        help="Pick a different schedule for the inference",
    )
    parser.add_argument(
        "--predictor", type=str, default=None,
        help="Predictor name (default reverse_diffusion; ddim/dpmpp for "
        "the fast exact-transition samplers)",
    )
    parser.add_argument(
        "--corrector", type=str, default=None,
        help="Corrector name (default ald2 production; none with "
        "ddim/dpmpp)",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--avg-last-k", type=int, default=None,
        help="average the evaluation weights of the k most recent "
        "checkpoints (checkpoint averaging; run-dir models only)",
    )
    parser.add_argument(
        "--stream-chunk-s", type=float, default=None,
        help="Separate in fixed-size chunks of this many seconds with "
        "overlap-add stitching and chunk-to-chunk permutation alignment "
        "(diffsep_tpu.streaming) — bounded memory and ONE compiled shape "
        "for arbitrarily long files",
    )
    parser.add_argument(
        "--stream-overlap-s", type=float, default=0.5,
        help="Chunk overlap for --stream-chunk-s",
    )
    args = parser.parse_args(argv)

    model_path = resolve_model_path(args.model)

    from .serve import _is_artifact

    if _is_artifact(model_path):
        # export artifact: the sampler + weights are baked in; batch wavs
        # through the artifact's static contract via the serving engine
        # (same output layout: s{i}/{stem}.wav)
        from .eval_common import reject_baked_flags, sampler_flag_map

        reject_baked_flags(
            {
                **sampler_flag_map(args),
                "--stream-chunk-s": args.stream_chunk_s,
                "--avg-last-k": args.avg_last_k,
            },
            "not available with an export artifact — sampler settings are "
            "baked at export time (cli/export_model.py) and streaming "
            "needs a live model",
        )
        from ..export import load_separator
        from .serve import ArtifactEngine

        eng = ArtifactEngine(load_separator(model_path), seed=args.seed)
        args.output_dir.mkdir(parents=True, exist_ok=True)
        files = sorted(args.input_dir.glob("*.wav"))
        n_err = 0
        for p, ok, msg in tqdm(
            eng.process(files, args.output_dir), total=len(files),
            desc="Separating wav files",
        ):
            if not ok:
                n_err += 1
                log.warning("%s: %s", p, msg)
        if n_err:
            log.warning("%d/%d files failed", n_err, len(files))
        return

    model, params = load_model(model_path, avg_last_k=args.avg_last_k)
    model_sr = int(model.config.model.fs)

    kw = {}
    if args.N is not None:
        kw["N"] = args.N
    if args.snr is not None:
        kw["snr"] = args.snr
    if args.corrector_steps is not None:
        kw["corrector_steps"] = args.corrector_steps
    kw["denoise"] = True if args.denoise is None else args.denoise
    if args.schedule is not None:
        kw["schedule"] = args.schedule

    args.output_dir.mkdir(parents=True, exist_ok=True)

    from ..train.losses import normalize_batch

    key = jax.random.PRNGKey(args.seed)
    files = sorted(args.input_dir.glob("*.wav"))
    bucket = model_sr  # 1 s length buckets => one compile per bucket
    for i, wavpath in enumerate(tqdm(files, desc="Separating wav files")):
        waveform, sr = load_wav(wavpath)
        if sr != model_sr:
            log.warning(
                "Skipping %s due to mismatched sample rate: model expects "
                "%d Hz, file is %d Hz.", wavpath.stem, model_sr, sr
            )
            continue
        if args.stream_chunk_s is not None:
            from ..streaming import separate_streaming

            est = separate_streaming(
                model, params, jax.random.fold_in(key, i),
                np.asarray(waveform),
                chunk_s=args.stream_chunk_s,
                overlap_s=args.stream_overlap_s,
                predictor_name=args.predictor or "reverse_diffusion",
                corrector_name=args.corrector or "ald2",
                **kw,
            )[None]
            est = scale_output(np.asarray(waveform)[None], est)
            for src in range(est.shape[1]):
                out = args.output_dir / f"s{src}" / f"{wavpath.stem}.wav"
                save_wav(out, est[0, src : src + 1], sr)
            continue
        mix = jnp.asarray(waveform)[None]  # (1, 1, T)
        # normalize on the true length, then pad to the bucket so XLA
        # compiles one program per bucket instead of one per file
        (mix_n, _), _, _ = normalize_batch(mix, None)
        n = mix_n.shape[-1]
        padded = -(-n // bucket) * bucket
        mix_p = jnp.pad(mix_n, ((0, 0), (0, 0), (0, padded - n)))
        sampler = model.get_pc_sampler(
            args.predictor or "reverse_diffusion",
            args.corrector or "ald2", mix_p, params,
            key=jax.random.fold_in(key, i), **kw,
        )
        est, _ = sampler()
        # no denormalize: the reference projects the RAW mixture onto the
        # normalized-domain estimates (separate.py:85-97) — scale_output
        # absorbs the std exactly, and adding the mean back first would
        # shift the projection by a spurious DC component
        est = scale_output(np.asarray(mix), np.asarray(est[..., :n]))
        for src in range(est.shape[1]):
            out = args.output_dir / f"s{src}" / f"{wavpath.stem}.wav"
            save_wav(out, est[0, src : src + 1], sr)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
