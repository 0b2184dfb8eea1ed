"""Multi-device sharded evaluation CLI.

Capability parity with the reference evaluate_mp.py: dataset index ranges
are split per device (evaluate_mp.py:465-503), each shard is evaluated
independently, and per-task results are merged by task id into
{split}.json + {split}_summary.json with the inference-variant dirname
`N-.._snr-.._corrstep-.._denoise-.._schedule-..` (evaluate_mp.py:447).

TPU-native redesign (SURVEY.md §2.8): the reference spawns one OS process
per CUDA device with its own model copy; here one process drives every
device — parameters are placed on each device once, a worker thread per
device streams its index range through the jitted sampler (JAX's async
dispatch overlaps device compute across threads), and CPU metrics run in a
host thread pool. Splits supported: test, val, libri-clean, libri-noisy
(evaluate_mp.py:381-387).
"""
from __future__ import annotations

import argparse
import json
import logging
import threading
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data import DataLoader, WSJ0_mix
from ..train.losses import normalize_batch, normalize_rows_host
from .eval_common import (
    compute_metrics, sampler_run_config, str2bool, summarize_mp,
)
from .loading import load_model

log = logging.getLogger(__name__)

from ..compilation_cache import enable as _enable_cache

_enable_cache()


def make_tasks(n_items: int, n_workers: int):
    """Split range(n_items) into contiguous (start, stop) per worker
    (evaluate_mp.py:465-503 round-robin equivalent)."""
    per = -(-n_items // n_workers)
    tasks = []
    for w in range(n_workers):
        start, stop = w * per, min((w + 1) * per, n_items)
        if start < stop:
            tasks.append((start, stop))
    return tasks


def evaluate_range_batched(
    model, params, dataset, start, stop, device, fs, n_src,
    sampler_kwargs, pesq_mode, stoi_extended, seed,
    batch_size, bucket_s,
    predictor="reverse_diffusion", corrector="ald2",
):
    """Throughput mode: group utterances of the same length bucket into
    batches so the jitted sampler amortizes over the batch (the TPU-native
    replacement for the reference's per-utterance loop). Metrics are still
    computed per utterance on unpadded lengths — on a host thread pool so
    the device dispatches the next batch instead of idling through
    PESQ/STOI (measured ~2x warm throughput on 5 s batches); `runtime` is
    the batch wall-clock divided by the batch size."""
    from concurrent.futures import ThreadPoolExecutor

    d_params = jax.device_put(params, device)
    key = jax.random.PRNGKey(seed)
    bucket = max(int(bucket_s * fs), 1)

    # group indices by padded-length bucket
    groups = {}
    for idx in range(start, stop):
        mix, target = dataset[idx]
        b = -(-mix.shape[-1] // bucket)
        groups.setdefault(b, []).append((idx, mix, target))

    def metrics_row(idx, target, mean_j, std_j, est, L, nfe, t_proc):
        tgt_n = (target[None] - mean_j) / std_j
        si_sdr, si_sir, si_sar, p_esq, s_toi, perm = compute_metrics(
            tgt_n, est, fs,
            pesq_mode=pesq_mode, stoi_extended=stoi_extended,
            n_src=n_src,
        )
        return {
            "batch_idx": idx,
            # nested [[...]]: reference-exact record schema (the slice
            # hits the batch axis; evaluate_mp.py:284-286)
            "si_sdr": si_sdr.tolist()[:n_src],
            "si_sir": si_sir.tolist()[:n_src],
            "si_sar": si_sar.tolist()[:n_src],
            "pesq": p_esq,
            "stoi": s_toi,
            "nfe": int(nfe),
            "runtime": t_proc,
            "len_s": float(L / fs),
        }

    futures = []
    results = []
    with ThreadPoolExecutor(max_workers=4) as pool:
        for n_buckets, items in sorted(groups.items()):
            padded_len = n_buckets * bucket
            for off in range(0, len(items), batch_size):
                chunk = items[off : off + batch_size]
                lens = [mix.shape[-1] for _, mix, _ in chunk]
                # normalize each row on its TRUE length, THEN pad (the
                # shared serving rule, train/losses.py:normalize_rows_host
                # — padding first folds the zero tail into the mixture
                # stats and deflates std by ~sqrt(true/padded))
                rows, mean, std = normalize_rows_host(
                    [mix for _, mix, _ in chunk], padded_len
                )
                # pad the batch to full batch_size so only one shape compiles
                real = len(chunk)
                while len(rows) < batch_size:
                    rows.append(np.zeros_like(rows[0]))
                mix_n = jax.device_put(jnp.asarray(np.stack(rows)), device)

                t_s = time.perf_counter()
                sampler = model.get_pc_sampler(
                    predictor, corrector, mix_n, d_params,
                    key=jax.random.fold_in(key, chunk[0][0]), **sampler_kwargs,
                )
                x_b, nfe = sampler()
                x_b = np.asarray(jax.device_get(x_b))
                t_proc = (time.perf_counter() - t_s) / real

                mean = np.asarray(mean)
                std = np.asarray(std)
                nfe0 = int(np.asarray(jax.device_get(nfe)).ravel()[0])
                # backpressure: when metrics are slower than sampling
                # (e.g. fast ddim sweeps) unbounded pending futures would
                # hold thousands of estimate copies in host memory
                while len(futures) > 64:
                    results.append(futures.pop(0).result())
                for j, (idx, _, target) in enumerate(chunk):
                    L = lens[j]
                    futures.append(
                        pool.submit(
                            metrics_row, idx, target, mean[j], std[j],
                            x_b[j : j + 1, :, :L].copy(), L, nfe0, t_proc,
                        )
                    )
                log.info(
                    "%s[batch@%d x%d] %.2fs/utt", device, chunk[0][0], real, t_proc
                )
        results.extend(f.result() for f in futures)
    return results


def evaluate_range(
    model, params, dataset, start, stop, device, fs, n_src,
    sampler_kwargs, pesq_mode, stoi_extended, seed,
    predictor="reverse_diffusion", corrector="ald2",
):
    """Evaluate dataset[start:stop] on one device; returns list of dicts."""
    d_params = jax.device_put(params, device)
    results = []
    key = jax.random.PRNGKey(seed)
    for idx in range(start, stop):
        mix, target = dataset[idx]
        mix = jax.device_put(jnp.asarray(mix)[None], device)
        target = jnp.asarray(target)[None]
        length = target.shape[-1] / fs

        (mix_n, _), mean, std = normalize_batch(mix, None)
        t_s = time.perf_counter()
        sampler = model.get_pc_sampler(
            predictor, corrector, mix_n, d_params,
            key=jax.random.fold_in(key, idx), **sampler_kwargs,
        )
        x_result, nfe = sampler()
        x_result = np.asarray(jax.device_get(x_result))  # force completion
        t_proc = time.perf_counter() - t_s
        # compare in the normalized domain like the reference
        target_n = (target - np.asarray(mean)) / np.asarray(std)

        si_sdr, si_sir, si_sar, p_esq, s_toi, perm = compute_metrics(
            target_n, np.asarray(x_result), fs,
            pesq_mode=pesq_mode, stoi_extended=stoi_extended, n_src=n_src,
        )
        results.append(
            {
                "batch_idx": idx,
                "si_sdr": si_sdr.tolist()[:n_src],
                "si_sir": si_sir.tolist()[:n_src],
                "si_sar": si_sar.tolist()[:n_src],
                "pesq": p_esq,
                "stoi": s_toi,
                "nfe": int(np.asarray(nfe).ravel()[0]),
                "runtime": t_proc,
                "len_s": float(length),
            }
        )
        log.info(
            "%s[%d] si_sdr=%.2f runtime=%.2fs", device, idx,
            float(np.mean(si_sdr)), t_proc,
        )
    return results


def evaluate_range_no_proc(dataset, start, stop, fs, n_src, pesq_mode,
                           stoi_extended):
    """__no_proc__ floor: score the raw mixture broadcast to every source
    (evaluate_mp.py:165-171, 245-250) — nfe=0, runtime=0."""
    results = []
    for idx in range(start, stop):
        mix, target = dataset[idx]
        mix = np.asarray(mix)[None]
        target = np.asarray(target)[None]
        x_result = np.broadcast_to(mix, target.shape)
        si_sdr, si_sir, si_sar, p_esq, s_toi, _ = compute_metrics(
            target, x_result, fs,
            pesq_mode=pesq_mode, stoi_extended=stoi_extended, n_src=n_src,
        )
        results.append(
            {
                "batch_idx": idx,
                "si_sdr": si_sdr.tolist()[:n_src],
                "si_sir": si_sir.tolist()[:n_src],
                "si_sar": si_sar.tolist()[:n_src],
                "pesq": p_esq,
                "stoi": s_toi,
                "nfe": 0,
                "runtime": 0.0,
                "len_s": float(target.shape[-1] / fs),
            }
        )
    return results


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(
        description="Multi-device sharded evaluation"
    )
    parser.add_argument("ckpt", type=Path)
    parser.add_argument("-o", "--output_dir", type=Path, default=Path("results"))
    parser.add_argument(
        "--splits", nargs="+",
        default=["test"],
        choices=["test", "val", "libri-clean", "libri-noisy"],
    )
    parser.add_argument(
        "-d", "--device", type=int, nargs="+", default=None,
        help="Device indices to use (default: all)",
    )
    parser.add_argument("-l", "--limit", type=int, default=None)
    parser.add_argument(
        "-b", "--batch-size", type=int, default=None,
        help="Batch same-length-bucket utterances per device for throughput "
        "(default: per-utterance like the reference)",
    )
    parser.add_argument(
        "--bucket-s", type=float, default=1.0,
        help="Length bucket in seconds for --batch-size mode",
    )
    parser.add_argument("-N", type=int, default=None)
    parser.add_argument("--snr", type=float, default=None)
    parser.add_argument("--corrector-steps", type=int, default=None)
    parser.add_argument("--denoise", type=str2bool, default=True)
    parser.add_argument("-s", "--schedule", type=str, default=None)
    parser.add_argument("--pesq-mode", choices=["nb", "wb"], default="nb")
    parser.add_argument("--stoi-no-extended", action="store_true")
    parser.add_argument(
        "--predictor", type=str, default="reverse_diffusion",
        help="Predictor name (ddim/dpmpp = fast exact-transition samplers)",
    )
    parser.add_argument(
        "--corrector", type=str, default="ald2",
        help="Corrector name (none with ddim/dpmpp)",
    )
    parser.add_argument("--tag", type=str, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--avg-last-k", type=int, default=None,
        help="average the evaluation weights of the k most recent "
        "checkpoints (checkpoint averaging; run-dir models only)",
    )
    args = parser.parse_args(argv)

    no_proc = str(args.ckpt) == "__no_proc__"
    if no_proc:
        # reference sentinel (evaluate_mp.py:165-171,425-429): score the raw
        # mixture; datasets at WSJ0_mix's default fs=16000, dir "mix"
        model, params, sampler_kwargs = None, None, {}
        fs, n_src = 16000, 2
        output_dir = args.output_dir / (args.tag or "mix")
    else:
        model, params = load_model(args.ckpt, avg_last_k=args.avg_last_k)
        cfg = model.config
        fs = int(cfg.model.fs)
        n_src = int(cfg.model.n_speakers)

        sampler_kwargs, tag_inf = sampler_run_config(cfg, args, args.ckpt)
        from .eval_common import experiment_tag

        output_dir = (
            args.output_dir
            / f"{experiment_tag(args.ckpt, args.tag)}_{tag_inf}"
        )
    output_dir.mkdir(parents=True, exist_ok=True)

    devices = jax.devices()
    if args.device is not None:
        devices = [devices[i] for i in args.device]

    for split in args.splits:
        if no_proc:
            # the split passes through like the reference
            # (evaluate_mp.py:171,425): val/test resolve; a libri-* split
            # raises WSJ0_mix's split validation loudly instead of
            # silently scoring WSJ0 data under a LibriMix label
            dataset = WSJ0_mix(
                path="data/wsj0_mix", n_spkr=2, cut="max", split=split
            )
        else:
            node = cfg.datamodule.get(split) or cfg.datamodule.get("test")
            ds_cfg = dict(node["dataset"])
            ds_cfg.pop("_target_", None)
            if not Path(ds_cfg["path"]).exists():
                # reference fallback (evaluate_mp.py:187-191)
                ds_cfg["path"] = (
                    "./data/wsj0_mix" if split in ("val", "test")
                    else "./data/LibriMix"
                )
            dataset = WSJ0_mix(**ds_cfg)
        n_items = len(dataset)
        if args.limit is not None:
            n_items = min(n_items, args.limit)

        tasks = make_tasks(n_items, len(devices))
        log.info("Processing %s: %d samples over %d devices",
                 split, n_items, len(tasks))

        all_results: list = [None] * len(tasks)
        threads = []
        for t_id, ((start, stop), device) in enumerate(zip(tasks, devices)):
            def work(t_id=t_id, start=start, stop=stop, device=device):
                if no_proc:
                    all_results[t_id] = evaluate_range_no_proc(
                        dataset, start, stop, fs, n_src, args.pesq_mode,
                        not args.stoi_no_extended,
                    )
                elif args.batch_size:
                    all_results[t_id] = evaluate_range_batched(
                        model, params, dataset, start, stop, device, fs,
                        n_src, sampler_kwargs, args.pesq_mode,
                        not args.stoi_no_extended, args.seed,
                        args.batch_size, args.bucket_s,
                        predictor=args.predictor, corrector=args.corrector,
                    )
                else:
                    all_results[t_id] = evaluate_range(
                        model, params, dataset, start, stop, device, fs,
                        n_src, sampler_kwargs, args.pesq_mode,
                        not args.stoi_no_extended, args.seed,
                        predictor=args.predictor, corrector=args.corrector,
                    )

            th = threading.Thread(target=work)
            th.start()
            threads.append(th)
        for th in threads:
            th.join()

        rows = [r for chunk in all_results if chunk for r in chunk]
        rows.sort(key=lambda r: r["batch_idx"])
        # reference-exact schema: the mp tool's {split}.json is a DICT
        # keyed by sample index (evaluate_mp.py:282,515-520), and its
        # summary variant averages each metric over its own finite count
        # with batch_idx riding along (evaluate_mp.py:133-151)
        results = {r["batch_idx"]: r for r in rows}
        with open(output_dir / f"{split}.json", "w") as f:
            json.dump(results, f, indent=2)
        summary = summarize_mp(results)
        with open(output_dir / f"{split}_summary.json", "w") as f:
            json.dump(summary, f, indent=2)
        log.info("%s summary: %s", split, summary)


if __name__ == "__main__":
    main()
