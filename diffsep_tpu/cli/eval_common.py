"""Shared evaluation helpers (metrics, summaries, sample/figure saving).

Capability parity with evaluate.py:29-161 (save_fig, save_samples,
compute_metrics, summarize) with the same result-JSON schema per utterance:
{batch_idx, si_sdr, si_sir, si_sar, pesq, stoi, nfe, runtime, len_s}
(evaluate.py:394-406).
"""
from __future__ import annotations

import logging
from collections import defaultdict
from pathlib import Path

import numpy as np

from ..data.audio_io import save_wav
from ..models.metrics import si_bss_eval_sources, stoi

log = logging.getLogger(__name__)


def compute_metrics(ref, est, fs, pesq_mode="nb", stoi_extended=True, n_src=2):
    """(si_sdr, si_sir, si_sar, pesq, stoi, perm) for one batch
    (evaluate.py:103-131). PESQ degrades gracefully when the optional
    package is missing."""
    ref = np.asarray(ref)
    est = np.asarray(est)
    si_sdr, si_sir, si_sar, perm = si_bss_eval_sources(
        ref, est, zero_mean=False, compute_permutation=True, clamp_db=100
    )
    est = est[:, perm[0], :]

    from ..models.pesq_native import get_pesq

    _pesq = get_pesq()
    p_esq, s_toi = [], []
    for src in range(n_src):
        try:
            p_esq.append(float(_pesq(fs, ref[0, src], est[0, src], pesq_mode)))
        except Exception:
            p_esq.append(float("nan"))
        s_toi.append(float(stoi(ref[0, src], est[0, src], fs, extended=stoi_extended)))

    return (
        si_sdr[..., :n_src],
        si_sir[..., :n_src],
        si_sar[..., :n_src],
        p_esq,
        s_toi,
        perm,
    )


def summarize(results):
    """Average every metric over utterances (evaluate.py:148-161).

    All-NaN metrics (e.g. PESQ without the optional package) summarize to
    NaN without numpy warnings."""
    metrics = set()
    summary = defaultdict(lambda: 0.0)
    for res in results:
        for met, val in res.items():
            metrics.add(met)
            vals = np.atleast_1d(np.asarray(val, dtype=np.float64))
            finite = vals[np.isfinite(vals)]
            summary[met] += finite.mean() if finite.size else np.nan
        summary["number"] += 1
    for met in metrics:
        summary[met] = float(summary[met] / summary["number"])
    summary["number"] = int(summary["number"])
    return dict(summary)


def summarize_mp(results, ignore_inf=True):
    """evaluate_mp.py:133-151's summary variant, semantics preserved
    exactly: results is a DICT keyed by sample index; per record, each
    metric's mean is ADDED unless (ignore_inf is False AND the mean is
    inf) — i.e. the flag IGNORES the inf check rather than ignoring infs
    (an inf poisons the summary at the default ignore_inf=True, and NaN
    always passes); each metric divides by its own add-count, and the
    batch_idx key rides along like every other record key."""
    metrics = set()
    summary = defaultdict(lambda: 0.0)
    denominator = defaultdict(lambda: 0)
    for res in results.values():
        for met, val in res.items():
            metrics.add(met)
            val_mean = np.mean(np.asarray(val, dtype=np.float64))
            if ignore_inf or not np.isinf(val_mean):
                summary[met] += val_mean
                denominator[met] += 1
        summary["number"] += 1
    for met in metrics:
        d = denominator[met]
        with np.errstate(invalid="ignore", divide="ignore"):
            summary[met] = float(np.float64(summary[met]) / d)
    summary["number"] = int(summary["number"])
    return dict(summary)


def experiment_tag(ckpt, tag):
    """`{exp_name}_{ckpt_name}` output-dir tag shared by both eval CLIs
    (evaluate.py:306-313, evaluate_mp.py:448-455): exp_name is the
    checkpoint's grandparent directory (the experiment dir holding
    hparams.yaml), ckpt_name its stem."""
    ckpt = Path(ckpt)
    if tag is not None:
        return tag
    # resolve() first: a bare relative filename ("checkpoint.pt") has no
    # parents[1] and raised IndexError
    exp_name = (
        ckpt.resolve().parents[1].name if ckpt.is_file() else ckpt.name
    )
    out = f"{exp_name}_{ckpt.stem}"
    if len(out) > 80:  # keep names filesystem-safe
        import hashlib

        out = out[:64] + "-" + hashlib.sha1(out.encode()).hexdigest()[:8]
    return out


def save_samples(mix, x_result, target, wav_out_dir, fs, batch_idx):
    """Normalized mix/estimates/targets wavs (evaluate.py:64-100)."""
    wav_out_dir = Path(wav_out_dir)
    wav_out_dir.mkdir(parents=True, exist_ok=True)
    mix = np.asarray(mix)[0]
    est = np.asarray(x_result)[0]
    tgt = np.asarray(target)[0]
    all_wav = np.concatenate((mix, est, tgt), axis=0)
    all_wav = all_wav * (0.95 / np.abs(all_wav).max())
    names = (
        ["mix"]
        + [f"enh{i}" for i in range(est.shape[0])]
        + [f"tgt{i}" for i in range(tgt.shape[0])]
    )
    for row, name in zip(all_wav, names):
        save_wav(wav_out_dir / f"{batch_idx:03d}_{name}.wav", row[None], fs)


def save_fig(
    x_result, intmet, target, fig_out_dir, batch_idx, n_fig=6, vmin=-75, vmax=0
):
    """Spectrogram-evolution PDF across the reverse process
    (evaluate.py:29-61). `intmet` is the stacked (N, 2, B, src, T) array
    produced by pc_sample(intermediate=True)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig_out_dir = Path(fig_out_dir)
    fig_out_dir.mkdir(parents=True, exist_ok=True)
    x_result = np.asarray(x_result)
    target = np.asarray(target)
    n_src = target.shape[1]

    n_steps = len(intmet)
    steps = np.round(np.linspace(0, 1, n_fig) * (n_steps - 1)).astype(np.int64)
    fig, axes = plt.subplots(n_src, n_fig + 1, figsize=(20, 4))
    im = None
    for idx, step in enumerate(steps):
        arr = np.asarray(intmet[step][0])
        for i in range(n_src):
            *_, im = axes[i, idx].specgram(arr[0, i], vmin=vmin, vmax=vmax)
            axes[i, idx].set_xticks([])
            axes[i, idx].set_yticks([])
            if i == 0:
                axes[i, idx].set_title(
                    f"t={(n_steps - 1 - step) / (n_steps - 1):.2f}"
                )
    for i in range(n_src):
        tgt = target[0, i] + np.random.randn(*target[0, i].shape) * 1e-10
        *_, im = axes[i, -1].specgram(tgt, vmin=vmin, vmax=vmax)
        axes[i, -1].set_xticks([])
        axes[i, -1].set_yticks([])
        if i == 0:
            axes[i, -1].set_title("clean")
    fig.tight_layout()
    fig.subplots_adjust(right=0.8)
    cbar_ax = fig.add_axes([0.85, 0.15, 0.05, 0.7])
    fig.colorbar(im, cax=cbar_ax)
    fig.savefig(fig_out_dir / f"evo_{batch_idx:03d}.pdf")
    plt.close(fig)


def str2bool(v):
    """argparse-friendly boolean: type=bool is a trap (bool('False') is
    True); accepts true/false/1/0/yes/no in any case."""
    if isinstance(v, bool):
        return v
    if v.lower() in ("1", "true", "t", "yes", "y"):
        return True
    if v.lower() in ("0", "false", "f", "no", "n"):
        return False
    raise ValueError(f"expected a boolean, got {v!r}")


def sampler_flag_map(args) -> dict:
    """The sampler-override CLI flags (None = not set by the user), for
    conflict checks against contexts where the sampler is already baked
    (export artifacts, --torch export). Picks up the shared sampler-flag
    vocabulary by attribute presence so a CLI that grows one of these
    flags is covered without touching its conflict check."""
    m = {}
    for attr, flag in (
        ("N", "-N"),
        ("snr", "--snr"),
        ("corrector_steps", "--corrector-steps"),
        ("predictor", "--predictor"),
        ("corrector", "--corrector"),
        ("schedule", "--schedule"),
        ("denoise", "--denoise"),
    ):
        if hasattr(args, attr):
            m[flag] = getattr(args, attr)
    return m


def reject_baked_flags(set_map: dict, why: str) -> None:
    """SystemExit naming every flag in `set_map` with a non-None value —
    the one implementation of the sampler-settings-are-baked error shared
    by separate.py, serve.py and export_model.py."""
    set_flags = [k for k, v in set_map.items() if v is not None]
    if set_flags:
        raise SystemExit(f"{', '.join(set_flags)}: {why}")


def sampler_run_config(cfg, args, ckpt):
    """Resolve the sampler operating point (checkpoint config defaults,
    overridden by CLI flags) plus the result-dir inference tag that
    figures.parse_name parses back — ONE implementation shared by
    evaluate.py and evaluate_mp.py so the dirname schema cannot drift
    between the two CLIs (the baked-flag conflict check already drifted
    once for exactly this reason).

    Returns (sampler_kwargs, tag_inf).
    """
    sk = dict(cfg.model.get("sampler", {}) or {})
    N = sk.get("N", 30) if args.N is None else args.N
    snr = sk.get("snr", 0.5) if args.snr is None else args.snr
    corrector_steps = (
        sk.get("corrector_steps", 1)
        if args.corrector_steps is None
        else args.corrector_steps
    )
    sampler_kwargs = dict(
        N=N, snr=snr, corrector_steps=corrector_steps,
        denoise=args.denoise, schedule=args.schedule,
    )
    tag_inf = (
        f"N-{N}_snr-{snr}_corrstep-{corrector_steps}"
        f"_denoise-{args.denoise}_schedule-{args.schedule}"
    )
    predictor = getattr(args, "predictor", None)
    corrector = getattr(args, "corrector", None)
    if (predictor, corrector) not in (
        (None, None), ("reverse_diffusion", "ald2"),
    ):
        # non-production sampler pair: without this a ddim run and a PC
        # run at the same N collide in one result dir (the reference
        # schema predates alternative predictors); default pair keeps the
        # reference-compatible dirname
        tag_inf += f"_pred-{predictor}_corr-{corrector}"
    if getattr(args, "avg_last_k", None) and args.avg_last_k > 1:
        # tag the number ACTUALLY averaged (fewer checkpoints may exist
        # than requested) so requested-k and effective-k runs never
        # collide in one result dir
        from .loading import resolve_avg_steps

        k_eff = len(resolve_avg_steps(ckpt, args.avg_last_k))
        tag_inf += f"_avgk-{k_eff}"
    return sampler_kwargs, tag_inf
