"""Single-process evaluation CLI.

Capability parity with the reference evaluate.py: per-utterance PC
separation with wall-clock timing, SI-SDR/SI-SIR/SI-SAR (+ PESQ when
available, + STOI), per-sample JSON + summary JSON with the reference's
schema and inference-variant directory tag
`N-.._snr-.._corrstep-.._denoise-.._schedule-..` (evaluate.py:306), the
`__no_proc__` sentinel scoring the raw mixture (243-254), and `--enhance`
mode over the VCTK-DEMAND test set (268-271).
"""
from __future__ import annotations

import argparse
import json
import logging
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from ..config.compose import ConfigNode
from ..data import DataLoader, NoisyDataset, WSJ0_mix
from ..train.losses import normalize_batch
from .eval_common import (
    compute_metrics, sampler_run_config, save_fig, save_samples, str2bool,
    summarize,
)
from .loading import _config_from_hparams, load_model

log = logging.getLogger(__name__)

from ..compilation_cache import enable as _enable_cache

_enable_cache()


def build_parser():
    parser = argparse.ArgumentParser(
        description="Run evaluation on validation or test dataset"
    )
    parser.add_argument("ckpt", type=Path, help="Path to checkpoint to use")
    parser.add_argument(
        "-o", "--output_dir", type=Path, default=Path("results"),
        help="The output folder",
    )
    parser.add_argument(
        "--enhance", default=False, action="store_true",
        help="Compute evaluation metrics for speech enhancement",
    )
    parser.add_argument(
        "--tag", type=str,
        help="A tag name for the experiment (default: experiment+ckpt name)",
    )
    parser.add_argument(
        "-l", "--limit", type=int, help="Limit the number of samples to process"
    )
    parser.add_argument(
        "--save-n", type=int,
        help="Save a limited number of output samples (default: save all)",
    )
    parser.add_argument("--val", action="store_true", help="Run on validation dataset")
    parser.add_argument("--test", action="store_true", help="Run on test dataset")
    parser.add_argument("-N", type=int, default=None, help="Number of steps")
    parser.add_argument("--snr", type=float, default=None, help="Corrector snr")
    parser.add_argument(
        "--corrector-steps", type=int, default=None, help="Number of corrector steps"
    )
    parser.add_argument(
        "--denoise", type=str2bool, default=True,
        help="Use denoising in solver (true/false)"
    )
    parser.add_argument(
        "--pesq-mode", type=str, choices=["nb", "wb"], default="nb",
        help="Mode for PESQ 'wb' or 'nb'",
    )
    parser.add_argument(
        "--stoi-no-extended", action="store_true", help="Disable extended STOI"
    )
    parser.add_argument(
        "-s", "--schedule", type=str, default=None,
        help="Pick a different schedule for the inference",
    )
    parser.add_argument(
        "--predictor", type=str, default="reverse_diffusion",
        help="Predictor name (ddim = fast exact-transition sampler)",
    )
    parser.add_argument(
        "--corrector", type=str, default="ald2",
        help="Corrector name (none with ddim)",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--avg-last-k", type=int, default=None,
        help="average the evaluation weights of the k most recent "
        "checkpoints (checkpoint averaging; run-dir models only)",
    )
    return parser


def evaluate_split(
    model,
    params,
    dataset,
    split,
    output_dir: Path,
    fs: int,
    n_src: int = 2,
    limit=None,
    save_n=None,
    sampler_kwargs=None,
    pesq_mode="nb",
    stoi_extended=True,
    no_proc=False,
    seed=0,
    bucket_s: float = 1.0,
    predictor="reverse_diffusion",
    corrector="ald2",
):
    """Evaluate one split; writes {split}.json and {split}_summary.json."""
    output_dir.mkdir(parents=True, exist_ok=True)
    fig_dir = output_dir / "fig" / split
    wav_dir = output_dir / "wav" / split

    # always the FULL split: the DataLoader's default process-sharding
    # is for training; evaluation must not silently score 1/P of the
    # set on a multi-process runtime
    dl = DataLoader(
        dataset, batch_size=1, shuffle=False, num_shards=1, shard_index=0
    )
    results = []
    key = jax.random.PRNGKey(seed)
    sampler_kwargs = dict(sampler_kwargs or {})

    log.info("Processing %s: %d samples", split, len(dl))
    for batch_idx, (mix, target) in enumerate(dl):
        if limit is not None and batch_idx >= limit:
            break
        save_samples_fig = save_n is None or batch_idx < save_n
        mix = jnp.asarray(mix)
        target = jnp.asarray(target)
        length = target.shape[-1] / fs

        if no_proc:
            x_result = jnp.broadcast_to(mix, target.shape)
            nfe, intmet, t_proc = 0, None, 0.0
            save_samples_fig = False
        else:
            (mix, target), _, _ = normalize_batch(mix, target)
            # bucket the length so XLA compiles one program per bucket, not
            # one per utterance (variable-length vs static shapes,
            # SURVEY.md §7.3 item 5); stats are computed pre-padding and the
            # zero tail matches the training collator's padding
            n_samples = mix.shape[-1]
            bucket = max(int(bucket_s * fs), 1)
            padded_len = -(-n_samples // bucket) * bucket
            mix_p = jnp.pad(mix, ((0, 0), (0, 0), (0, padded_len - n_samples)))
            sampler = model.get_pc_sampler(
                predictor,
                corrector,
                mix_p,
                params,
                key=jax.random.fold_in(key, batch_idx),
                intermediate=save_samples_fig,
                **sampler_kwargs,
            )
            t_s = time.perf_counter()
            out = sampler()
            x_result, nfe, *others = out
            # force completion: async dispatch (and some remote backends'
            # block_until_ready) returns before execution finishes
            x_result = jnp.asarray(np.asarray(jax.device_get(x_result)))
            t_proc = time.perf_counter() - t_s
            x_result = x_result[..., :n_samples]
            intmet = others[0] if others else None
            if intmet is not None:
                intmet = intmet[..., :n_samples]

        si_sdr, si_sir, si_sar, p_esq, s_toi, perm = compute_metrics(
            target, x_result, fs,
            pesq_mode=pesq_mode, stoi_extended=stoi_extended, n_src=n_src,
        )
        x_result = np.asarray(x_result)[:, perm[0], :]

        results.append(
            {
                "batch_idx": batch_idx,
                # nested [[...]] on purpose: the reference records
                # si_sdr.tolist()[:n_src] — the slice hits the BATCH axis of
                # the (1, n_src) metric, so its JSON carries one nested list
                # per record (evaluate.py:394-397, evaluate_mp.py:284-286)
                # and every downstream consumer np.mean()s it
                "si_sdr": si_sdr.tolist()[:n_src],
                "si_sir": si_sir.tolist()[:n_src],
                "si_sar": si_sar.tolist()[:n_src],
                "pesq": p_esq,
                "stoi": s_toi,
                "nfe": int(np.asarray(nfe).ravel()[0]) if not no_proc else 0,
                "runtime": t_proc,
                "len_s": float(length),
            }
        )
        msg = " ".join(
            f"{met}={np.nanmean(val):.3f}"
            for met, val in results[-1].items()
            if met != "batch_idx"
        )
        log.info("%s %s", split, msg)

        if save_samples_fig:
            if intmet is not None:
                intmet = np.asarray(intmet)[:, :, :, perm[0], :]
            save_samples(mix, x_result, target, wav_dir, fs, batch_idx)
            if intmet is not None:
                save_fig(x_result, intmet, target, fig_dir, batch_idx)

    with open(output_dir / f"{split}.json", "w") as f:
        json.dump(results, f, indent=2)
    # summarize over the FULL records, batch_idx included — the reference's
    # summary schema carries a (meaningless but present) mean sample index
    # because its summarize averages every record key (evaluate.py:152-155)
    summary = summarize(results)
    with open(output_dir / f"{split}_summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    return results, summary


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)
    if not (args.val or args.test):
        build_parser().error("No action requested, add --val or --test")

    no_proc = str(args.ckpt) == "__no_proc__"
    datasets = {}

    if no_proc:
        # no fs argument on purpose: the reference's sentinel path
        # constructs WSJ0_mix with the class default fs=16000
        # (evaluate.py:243-254, wsj0_mix.py:29) so it scores wav16k/
        path, n_spkr, cut = "data/wsj0_mix", 2, "max"
        if args.val:
            datasets["val"] = WSJ0_mix(path=path, n_spkr=n_spkr, cut=cut, split="val")
        if args.test:
            datasets["test"] = WSJ0_mix(path=path, n_spkr=n_spkr, cut=cut, split="test")
        model, params, sampler_kwargs, fs, n_src = None, None, {}, 16000, 2
        output_dir = args.output_dir / (args.tag or "mix")
    else:
        model, params = load_model(args.ckpt, avg_last_k=args.avg_last_k)
        cfg = model.config
        fs = int(cfg.model.fs)

        if args.enhance:
            ds_cfg = dict(cfg.datamodule["test"]["dataset"])
            ds_cfg.pop("_target_", None)
            datasets["test"] = NoisyDataset(**ds_cfg)
            n_src = 1
        else:
            for split in ("val", "test"):
                if not getattr(args, split):
                    continue
                ds_cfg = dict(cfg.datamodule[split]["dataset"])
                ds_cfg.pop("_target_", None)
                if not Path(ds_cfg["path"]).exists():
                    ds_cfg["path"] = "./data/wsj0_mix"
                datasets[split] = WSJ0_mix(**ds_cfg)
            n_src = 2

        sampler_kwargs, tag_inf = sampler_run_config(cfg, args, args.ckpt)
        from .eval_common import experiment_tag

        output_dir = (
            args.output_dir
            / f"{experiment_tag(args.ckpt, args.tag)}_{tag_inf}"
        )

    for split, ds in datasets.items():
        evaluate_split(
            model, params, ds, split, output_dir,
            fs=fs, n_src=n_src, limit=args.limit, save_n=args.save_n,
            sampler_kwargs=sampler_kwargs,
            pesq_mode=args.pesq_mode,
            stoi_extended=not args.stoi_no_extended,
            no_proc=no_proc, seed=args.seed,
            predictor=args.predictor, corrector=args.corrector,
        )


def evaluate_datamodule(model, state, dm, output_dir):
    """Post-training test hook used by cli/train.py (test=true).

    Multi-process runs shard the split: every process scores a contiguous
    index range (reference semantics — Lightning's DistributedSampler
    shards trainer.test across DDP ranks), writes a partial result file,
    and rank 0 merges after a barrier. Rank-GATING instead would leave
    ranks 1..P-1 exiting while rank 0 runs minutes of inference, and the
    JAX coordination-service shutdown barrier kills the stragglers'
    coordinator — the same failure mode the 2-process test workers guard
    against with sync_global_devices."""
    if state is None:
        # cli/train.py substitutes freshly initialized weights for
        # train=false test=true (reference train.py:150-155); a bare None
        # here would only crash opaquely inside flax apply
        raise ValueError(
            "evaluate_datamodule needs a state with .ema.params"
        )
    params = state.ema.params
    fs = int(model.config.model.fs)
    dataset = dm.datasets.get("test") or dm.test_dataloader().dataset
    output_dir = Path(output_dir)
    n_proc = jax.process_count()
    if n_proc == 1:
        return evaluate_split(
            model, params, dataset, "test", output_dir, fs=fs,
            sampler_kwargs=dict(model.sampler_kwargs),
        )

    from jax.experimental import multihost_utils

    from ..data.vctk_demand import Subset

    # state lives on the global mesh but each process evaluates its own
    # data: pull a host-local copy pinned to a local device (same pattern
    # as multi-host validation, train/loop.py). Cross-process-sharded
    # leaves (fsdp) cannot be device_get directly — gather each to
    # replicated first (per leaf: peak extra device memory = one leaf).
    if params is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        def _host_pull(leaf):
            if hasattr(leaf, "is_fully_addressable") and not leaf.is_fully_addressable:
                leaf = jax.jit(
                    lambda x: x,
                    out_shardings=NamedSharding(
                        leaf.sharding.mesh, PartitionSpec()
                    ),
                )(leaf)
            return np.asarray(jax.device_get(leaf))

        params = jax.device_put(
            jax.tree_util.tree_map(_host_pull, params),
            jax.local_devices()[0],
        )
    rank = jax.process_index()
    n = len(dataset)
    per = -(-n // n_proc)
    start, stop = min(rank * per, n), min((rank + 1) * per, n)
    if stop > start:
        evaluate_split(
            model, params, Subset(dataset, range(start, stop)), "test",
            output_dir / f"part{rank}", fs=fs,
            sampler_kwargs=dict(model.sampler_kwargs),
        )
    # shards are balanced, so the skew at this barrier is bounded by a
    # few utterances, not the whole split
    multihost_utils.sync_global_devices("post_train_test_eval_done")
    if rank != 0:
        return None  # rank 0 merges and returns (results, summary)
    results = []
    for i in range(n_proc):
        part = output_dir / f"part{i}" / "test.json"
        if part.exists():
            results.extend(json.loads(part.read_text()))
    for j, rec in enumerate(results):  # per-shard indices -> global order
        rec["batch_idx"] = j
    with open(output_dir / "test.json", "w") as f:
        json.dump(results, f, indent=2)
    # full records, batch_idx included — same summary schema as the
    # single-process path (evaluate_split) regardless of process count
    summary = summarize(results)
    with open(output_dir / "test_summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    return results, summary


if __name__ == "__main__":
    main()
