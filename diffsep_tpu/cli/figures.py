"""Paper-figure scripts.

Capability parity with the reference's figure_* family:
  * sde_marginal_evolution  (figure_sde_marginal_evolution.py:40-134) —
    mean-matrix coefficients, mixture error, Pearson correlation over t for
    several d_lambda values; falls back to synthetic mixtures when the
    WSJ0-mix validation set is absent so the script runs anywhere.
  * reverse_diffusion_example (figure_reverse_diffusion_example.py) —
    spectrogram evolution of the reverse process for a trained checkpoint.
  * samples (figure_samples.py) — tiered sample vignettes by SI-SDR
    percentile from result JSONs.
  * exp_inference (figure_exp_inference.py) — metric-vs-inference-parameter
    sweeps parsed from result directory names
    `..._N-*_snr-*_corrstep-*_denoise-*...`.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


# --------------------------------------------------------------------------
def sde_marginal_evolution(argv=None):
    import jax.numpy as jnp

    from ..data import WSJ0_mix
    from ..sde import MixSDE
    from ..train.losses import normalize_batch

    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=Path, default=Path("data/wsj0_mix"))
    parser.add_argument("--out", type=Path, default=Path("figures"))
    parser.add_argument("--limit", type=int, default=5)
    parser.add_argument("--d-lambdas", type=float, nargs="+", default=[2, 3, 4])
    args = parser.parse_args(argv)
    plt = _mpl()

    t = jnp.linspace(0.01, 1.0, 200)
    fig, (ax1, ax2, ax3) = plt.subplots(1, 3, figsize=(9, 3))

    def iter_samples():
        try:
            ds = WSJ0_mix(args.data, 2, 8000, "max", "val")
            for i in range(min(args.limit, len(ds))):
                yield ds[i]
        except (FileNotFoundError, OSError):
            rng = np.random.default_rng(0)
            for _ in range(args.limit):
                tgt = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
                yield tgt.sum(0, keepdims=True), tgt

    for d_lambda in args.d_lambdas:
        sde = MixSDE(ndim=2, d_lambda=d_lambda, sigma_min=0.05, sigma_max=0.5, N=30)
        error_T = np.zeros(t.shape)
        n = 0
        first = True
        for mix, tgt in iter_samples():
            mix, tgt = jnp.asarray(mix)[None], jnp.asarray(tgt)[None]
            (mix, tgt), _, _ = normalize_batch(mix, tgt)
            xT = jnp.broadcast_to(0.5 * mix, (1, 2, mix.shape[-1]))
            # evaluate the marginal on the t-grid by batching over time
            mmat = sde._mean_mix_mat(t)  # (T, 2, 2)
            mu = jnp.einsum("tij,bjn->tbin", mmat, tgt)
            error_T += np.asarray(((xT[None] - mu) ** 2).sum(axis=(1, 2, 3)))
            n += tgt.shape[1] * tgt.shape[2]
            if first:
                first = False
                L = sde._std(t)
                cov = np.asarray(L @ L)
                mm = np.asarray(mmat)
                ax2.plot(t, mm[:, 0, 0], "-", label=f"$\\gamma={d_lambda}$")
                ax2.plot(t, mm[:, 0, 1], "--")
                ax3.plot(t, cov[:, 0, 1] / cov[:, 0, 0], label=f"$\\gamma={d_lambda}$")
        ax1.semilogy(t, error_T / n, "-", label=f"$\\gamma={d_lambda}$")

    ax1.set_title(r"$E\|\mu_t - \bar{s}\|^2$")
    ax2.set_title(r"Coefficients of $e^{-t\gamma P}$")
    ax3.set_title("Pearson corr. coeff.")
    for ax in (ax1, ax2, ax3):
        ax.set_xlabel("Time $t$")
    ax3.legend()
    args.out.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(args.out / "paper_sde_marginal_evolution.pdf")


# --------------------------------------------------------------------------
def reverse_diffusion_example(argv=None):
    import jax
    import jax.numpy as jnp

    from ..data import WSJ0_mix
    from ..train.losses import normalize_batch
    from .eval_common import save_fig
    from .loading import load_model

    parser = argparse.ArgumentParser()
    parser.add_argument("ckpt", type=Path)
    parser.add_argument("--data", type=Path, default=Path("data/wsj0_mix"))
    parser.add_argument("--out", type=Path, default=Path("figures"))
    parser.add_argument("--index", type=int, default=0)
    parser.add_argument("-N", type=int, default=30)
    args = parser.parse_args(argv)

    model, params = load_model(args.ckpt)
    ds = WSJ0_mix(args.data, 2, int(model.config.model.fs), "max", "val")
    mix, target = ds[args.index]
    mix = jnp.asarray(mix)[None]
    target = jnp.asarray(target)[None]
    (mix, target), _, _ = normalize_batch(mix, target)

    sampler = model.get_pc_sampler(
        "reverse_diffusion", "ald2", mix, params, N=args.N, intermediate=True,
        snr=0.5, corrector_steps=1,
    )
    x, nfe, ims = sampler()
    args.out.mkdir(parents=True, exist_ok=True)
    save_fig(np.asarray(x), np.asarray(ims), np.asarray(target), args.out,
             args.index)


# --------------------------------------------------------------------------
def samples(argv=None):
    """Tiered sample vignettes by SI-SDR percentile (figure_samples.py)."""
    parser = argparse.ArgumentParser()
    parser.add_argument("results", type=Path, help="result folder with test.json + wav/")
    parser.add_argument("--split", default="test")
    parser.add_argument("--percentiles", type=float, nargs="+",
                        default=[10, 50, 90])
    parser.add_argument("--out", type=Path, default=Path("figures"))
    args = parser.parse_args(argv)
    plt = _mpl()

    from ..data.audio_io import load_wav

    with open(args.results / f"{args.split}.json") as f:
        results = json.load(f)
    if isinstance(results, dict):
        # evaluate_mp writes the reference's dict-keyed record format
        # (evaluate_mp.py:282); evaluate.py writes a list
        results = sorted(results.values(), key=lambda r: r["batch_idx"])
    sisdr = np.array([np.mean(r["si_sdr"]) for r in results])
    order = np.argsort(sisdr)

    picks = [
        results[order[int(np.clip(p / 100 * (len(order) - 1), 0, len(order) - 1))]]
        for p in args.percentiles
    ]
    fig, axes = plt.subplots(len(picks), 3, figsize=(9, 2.5 * len(picks)))
    if len(picks) == 1:
        axes = axes[None, :]
    wav_dir = args.results / "wav" / args.split
    for row, (p, res) in enumerate(zip(args.percentiles, picks)):
        idx = res["batch_idx"]
        for col, name in enumerate(["mix", "enh0", "tgt0"]):
            f = wav_dir / f"{idx:03d}_{name}.wav"
            if not f.exists():
                continue
            sig, fs = load_wav(f)
            axes[row, col].specgram(sig[0], Fs=fs)
            axes[row, col].set_xticks([])
            axes[row, col].set_yticks([])
            if col == 0:
                axes[row, col].set_ylabel(
                    f"p{p:.0f}: {np.mean(res['si_sdr']):.1f} dB"
                )
            if row == 0:
                axes[row, col].set_title(name)
    args.out.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(args.out / f"samples_{args.split}.pdf")


# --------------------------------------------------------------------------
def parse_name(name: str) -> dict:
    """Parse `..._N-30_snr-0.5_corrstep-1_denoise-True_schedule-None` tails
    (figure_exp_inference.py:22-37, extended with the schedule field)."""
    fields = name.split("_")
    ret = {}
    for f in fields:
        if "-" not in f:
            continue
        key, _, val = f.partition("-")
        if key in ("N", "corrstep", "avgk"):
            ret[key] = int(val)
        elif key == "snr":
            ret[key] = float(val)
        elif key == "denoise":
            ret[key] = val == "True"
        elif key == "schedule":
            ret[key] = None if val == "None" else val
        elif key in ("pred", "corr"):
            ret[key] = val
    return ret


def exp_inference(argv=None):
    parser = argparse.ArgumentParser(
        description="Create figure from experiment data"
    )
    parser.add_argument("path_base", type=Path, help="base path of experiment data")
    parser.add_argument("key", type=str, help="key to use as x axis")
    parser.add_argument("--out", type=Path, default=Path("figures"))
    args = parser.parse_args(argv)
    plt = _mpl()

    pesq, sisdr = [], []
    for split in ["val", "test"]:
        exp_folder = args.path_base.parent
        for subfold in exp_folder.rglob(f"{args.path_base.name}*"):
            inf = parse_name(subfold.name)
            if args.key not in inf:
                continue
            summary = subfold / f"{split}_summary.json"
            if not summary.exists():
                continue
            with open(summary) as f:
                data = json.load(f)
            if "pesq" in data:
                pesq.append((inf[args.key], data["pesq"]))
            if "si_sdr" in data:
                sisdr.append((inf[args.key], data["si_sdr"]))

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(8, 3))
    for ax, series, label in [(ax1, sorted(pesq), "pesq"),
                              (ax2, sorted(sisdr), "si-sdr (dB)")]:
        if series:
            ax.plot([a[0] for a in series], [a[1] for a in series], "o-")
        ax.set_ylabel(label)
        ax.set_xlabel(args.key)
    args.out.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(args.out / f"exp_inference_{args.key}.pdf")
    # returned for tests: the exact series that were plotted
    return {"pesq": sorted(pesq), "si_sdr": sorted(sisdr)}


def main(argv=None):
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    cmds = {
        "sde_marginal_evolution": sde_marginal_evolution,
        "reverse_diffusion_example": reverse_diffusion_example,
        "samples": samples,
        "exp_inference": exp_inference,
    }
    if not argv or argv[0] not in cmds:
        raise SystemExit(f"usage: figures <{'|'.join(cmds)}> [args...]")
    cmds[argv[0]](argv[1:])


if __name__ == "__main__":
    main()
