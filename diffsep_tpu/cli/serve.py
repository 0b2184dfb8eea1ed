"""Long-running separation service (TPU-native serving path).

No reference equivalent (the reference only ships batch CLIs); this is the
deployment-shaped entry point: load the model ONCE, keep parameters on
device, pre-compile the sampler for the expected length buckets, then
serve requests forever. Two front-ends share the engine:

  * stdin mode (default): read wav paths (one per line), write separated
    sources to `--output-dir/s{i}/{stem}.wav`, print `DONE <path>` (or
    `ERROR <path> <reason>`) per request — a line protocol that is trivial
    to drive from any supervisor or socket wrapper.
  * `--watch`: poll the input directory for new wav files and process
    them as they appear (drop-folder deployment).

Serving properties:
  * one compiled program per (bucket length, batch size) — requests are
    grouped by 1 s length bucket and micro-batched up to `--batch`
    (padding the tail), so steady-state serving never compiles;
  * `--warmup-s` compiles the common buckets at startup so the first
    request hits a warm cache;
  * the persistent compilation cache (~/.cache/diffsep_jax) makes warmup
    itself fast after the first ever start;
  * `--model model.dsx` serves a self-contained export artifact
    (cli/export_model.py) instead of a live model: no config, checkpoint,
    or model code needed on the serving host — one static-shape StableHLO
    program whose per-row valid-length input handles variable request
    lengths.
"""
from __future__ import annotations

import argparse
import logging
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data.audio_io import load_wav, save_wav
from .loading import load_model
from .separate import resolve_model_path, scale_output

log = logging.getLogger(__name__)

from ..compilation_cache import enable as _enable_cache

_enable_cache()


# host-side normalize-on-true-length-then-pad rule; one shared
# implementation for serve + streaming (train/losses.py)
from ..train.losses import normalize_rows_host as _normalize_rows


class _EngineBase:
    """Shared serving front half: request validation, length-bucket
    grouping, micro-batching, output writing. Subclasses provide
    `_dispatch_bucket` (enqueue the compiled separation call — JAX
    dispatch is async, so this returns immediately with device-array
    handles) and `_finalize_bucket` (device_get + per-request
    postprocessing), and set `fs`, `batch`, `bucket`, and optionally
    `max_samples` (a static-shape contract — longer requests get a
    per-file error instead of failing a batch).

    The split exists because the device->host transfer of a separated
    micro-batch is NOT free: over the axon TPU tunnel a 20 MB batch
    costs ~0.5 s (~38 MB/s), which is 37% of a DDIM-N=2 step. The batch
    loops therefore run a depth-1 pipeline — dispatch micro-batch k+1
    BEFORE finalizing k — so the transfer rides the DMA engines under
    the next batch's compute (measured scripts/pipeline_throughput.py:
    53.7 -> 90.4 utt/s at N=2-log, 26.6 -> 33.0 at N=6)."""

    max_samples: int | None = None

    def _run_bucket(self, mixes):
        """Unpipelined convenience (warmup, one-shot callers)."""
        return self._finalize_bucket(self._dispatch_bucket(mixes))

    def validate(self, wav: np.ndarray, sr: int) -> str | None:
        """Reject a request before it can poison a micro-batch. Returns an
        error message, or None if the signal is servable. Shared by the
        file front-ends and the HTTP front (serve_http.py): a (2, n) row
        would make np.stack in _run_bucket raise and fail the whole
        micro-batch, taking innocent co-batched requests down with it."""
        if sr != self.fs:
            return f"sample rate {sr} != model {self.fs}"
        if wav.ndim != 2 or wav.shape[0] != 1:
            return f"expected mono (1, n), got shape {tuple(wav.shape)}"
        if wav.shape[-1] < 1:
            return "empty signal"
        if self.max_samples is not None and wav.shape[-1] > self.max_samples:
            return (
                f"{wav.shape[-1]} samples exceeds the artifact's "
                f"static contract ({self.max_samples}); chunk it "
                "(separate.py --stream-chunk-s) or export a longer "
                "artifact"
            )
        return None

    def process(self, paths, output_dir: Path):
        """Separate `paths`, grouped by length bucket, micro-batched.
        Yields (path, ok, message)."""
        items = []
        for p in paths:
            p = Path(p)
            try:
                wav, sr = load_wav(p)
                wav = np.asarray(wav, np.float32)
                err = self.validate(wav, sr)
                if err is not None:
                    yield p, False, err
                    continue
                items.append((p, wav))
            except Exception as e:  # unreadable file must not kill serving
                yield p, False, f"{type(e).__name__}: {e}"

        groups = {}
        for p, wav in items:
            b = -(-wav.shape[-1] // self.bucket)
            groups.setdefault(b, []).append((p, wav))

        chunks = []
        for _, group in sorted(groups.items()):
            for off in range(0, len(group), self.batch):
                chunks.append(group[off : off + self.batch])

        def finalize(chunk, handle, t0):
            """Per-chunk error isolation: a failed finalize (device fault)
            or write fails only its own chunk/file."""
            t_fin = time.perf_counter()
            try:
                ests = self._finalize_bucket(handle)
            except Exception as e:
                for p, _ in chunk:
                    yield p, False, f"{type(e).__name__}: {e}"
                return
            done = time.perf_counter()
            # under the depth-1 pipeline, dispatch-to-complete includes the
            # overlap window with the next chunk's dispatch — report it
            # explicitly as pipeline latency so the per-file number is not
            # mistaken for the pre-pipeline per-chunk compute time, which
            # is what the finalize-wait measures
            lat = done - t0
            wait = done - t_fin
            for (p, _), est in zip(chunk, ests):
                try:  # output I/O errors must not kill serving either
                    for src in range(est.shape[0]):
                        out = output_dir / f"s{src}" / f"{p.stem}.wav"
                        save_wav(out, est[src : src + 1], self.fs)
                except Exception as e:
                    yield p, False, f"write failed: {type(e).__name__}: {e}"
                    continue
                yield p, True, (
                    f"pipeline latency {lat:.3f}s/{len(chunk)}-batch, "
                    f"finalize wait {wait:.3f}s"
                )

        # depth-1 pipeline: dispatch chunk k+1 before finalizing chunk k,
        # overlapping k's D2H transfer with k+1's compute (class docstring)
        pending = None  # (chunk, handle, t0)
        for chunk in chunks:
            t0 = time.perf_counter()
            try:
                handle = self._dispatch_bucket([w for _, w in chunk])
            except Exception as e:
                if pending is not None:
                    yield from finalize(*pending)
                    pending = None
                for p, _ in chunk:
                    yield p, False, f"{type(e).__name__}: {e}"
                continue
            if pending is not None:
                yield from finalize(*pending)
            pending = (chunk, handle, t0)
        if pending is not None:
            yield from finalize(*pending)


class SeparationEngine(_EngineBase):
    """Compile-once micro-batching separation engine (live model)."""

    def __init__(self, model, params, batch: int = 4, bucket_s: float = 1.0,
                 seed: int = 0, sampler_kwargs=None,
                 predictor: str = "reverse_diffusion", corrector: str = "ald2"):
        self.model = model
        self.params = params
        self.batch = batch
        self.fs = int(model.config.model.fs)
        self.bucket = max(int(bucket_s * self.fs), 1)
        self.key = jax.random.PRNGKey(seed)
        self.n_req = 0
        self.predictor = predictor
        self.corrector = corrector
        self.sampler_kwargs = dict(sampler_kwargs or {})

    def warmup(self, seconds) -> None:
        """Pre-compile the sampler for the given utterance lengths."""
        for s in seconds:
            n = int(s * self.fs)
            mixes = [np.zeros((1, n), np.float32) + 1e-3]
            self._run_bucket(mixes)
            log.info("warmup: compiled %.1f s bucket", s)

    def _dispatch_bucket(self, mixes):
        """Enqueue separation of a list of single-channel (1, n) signals
        sharing one length bucket; returns a handle for _finalize_bucket.
        JAX dispatch is async — the device-array `est` comes back without
        waiting for execution."""
        lens = [m.shape[-1] for m in mixes]
        padded = -(-max(lens) // self.bucket) * self.bucket
        rows, means, stds = _normalize_rows(mixes, padded)
        while len(rows) < self.batch:
            rows.append(np.zeros_like(rows[0]))
            means.append(0.0)
            stds.append(1.0)
        mix_n = jnp.asarray(np.stack(rows))  # (batch, 1, padded), normalized
        mean = np.asarray(means, np.float32).reshape(-1, 1, 1)
        std = np.asarray(stds, np.float32).reshape(-1, 1, 1)
        self.n_req += 1
        sampler = self.model.get_pc_sampler(
            self.predictor,
            self.corrector,
            mix_n,
            self.params,
            key=jax.random.fold_in(self.key, self.n_req),
            **self.sampler_kwargs,
        )
        est, _ = sampler()
        return est, mean, std, mixes, lens

    def _finalize_bucket(self, handle):
        """device_get + per-request postprocessing -> list of (n_src, n)."""
        est, mean, std, mixes, lens = handle
        # denormalize on host (eager device elementwise ops are slow over
        # the remote link; the transfer is needed anyway)
        est = np.asarray(jax.device_get(est)) * std + mean
        out = []
        for j in range(len(mixes)):
            e = est[j : j + 1, :, : lens[j]]
            e = scale_output(np.asarray(mixes[j])[None], e)
            out.append(e[0])
        return out

class ArtifactEngine(_EngineBase):
    """Serve from a self-contained export artifact (diffsep_tpu/export.py):
    no config, checkpoint, or model code on the serving host — the whole
    reverse process with weights baked in is one StableHLO call with a
    STATIC (batch, n_samples) contract. Variable request lengths ride the
    artifact's per-row `n_valid` input: rows are zero-padded here and the
    program computes normalization stats over each true span only (the
    same normalize-on-true-length rule as the live engine's host path)."""

    def __init__(self, sep, seed: int = 0):
        self.sep = sep
        self.fs = int(sep.meta["fs"])
        self.batch = sep.batch
        self.bucket = sep.n_samples  # single static length bucket
        self.max_samples = sep.n_samples
        self.seed = seed
        self.n_req = 0

    def warmup(self, seconds=()) -> None:
        """Compile/load the one static program (lengths are baked in)."""
        self._run_bucket(
            [np.zeros((1, self.max_samples), np.float32) + 1e-3]
        )
        log.info("warmup: compiled the artifact's static shape")

    def _dispatch_bucket(self, mixes):
        lens = [m.shape[-1] for m in mixes]
        n = self.sep.n_samples
        rows = [
            np.pad(np.asarray(m, np.float32), ((0, 0), (0, n - m.shape[-1])))
            for m in mixes
        ]
        n_valid = list(lens)
        while len(rows) < self.batch:  # filler rows: full-length zeros
            rows.append(np.zeros((1, n), np.float32))
            n_valid.append(n)
        self.n_req += 1
        seed = (self.seed * 1_000_003 + self.n_req) & 0x7FFFFFFF
        est = self.sep.call(
            seed, np.stack(rows), np.asarray(n_valid, np.int32)
        )
        return est, mixes, lens

    def _finalize_bucket(self, handle):
        est, mixes, lens = handle
        est = np.asarray(jax.device_get(est))
        out = []
        for j in range(len(mixes)):
            e = est[j : j + 1, :, : lens[j]]
            e = scale_output(np.asarray(mixes[j])[None], e)
            out.append(e[0])
        return out


def _is_artifact(path: Path) -> bool:
    """Sniff the export-artifact magic so --model accepts either a
    checkpoint flavor or a .dsx file regardless of its name."""
    try:
        with open(path, "rb") as f:
            from ..export import _MAGIC

            return f.read(len(_MAGIC)) == _MAGIC
    except (OSError, IsADirectoryError):
        return False


def _engine_from_args(args):
    if _is_artifact(args.model):
        from .eval_common import reject_baked_flags, sampler_flag_map

        reject_baked_flags(
            sampler_flag_map(args),
            "sampler settings are baked into the artifact at export time "
            "(cli/export_model.py); re-export to change them",
        )
        from ..export import load_separator

        eng = ArtifactEngine(load_separator(args.model), seed=args.seed)
        log.info(
            "artifact engine: batch=%d n_samples=%d fs=%d (--batch/"
            "--bucket-s ignored; the artifact's static contract rules)",
            eng.batch, eng.max_samples, eng.fs,
        )
        return eng
    model, params = load_model(resolve_model_path(args.model))
    kw = {}
    if args.N is not None:
        kw["N"] = args.N
    if args.snr is not None:
        kw["snr"] = args.snr
    if args.corrector_steps is not None:
        kw["corrector_steps"] = args.corrector_steps
    return SeparationEngine(
        model, params, batch=args.batch, bucket_s=args.bucket_s,
        seed=args.seed, sampler_kwargs=kw,
        predictor=args.predictor or "reverse_diffusion",
        corrector=args.corrector or "ald2",
    )


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Long-running separation service: stdin line protocol "
        "or --watch drop-folder mode"
    )
    parser.add_argument("output_dir", type=Path)
    parser.add_argument("--model", type=Path, default=Path("fakufaku/diffsep"),
                        help="run dir / step dir / .ckpt, or an export "
                        "artifact (cli/export_model.py) for model-code-free "
                        "serving")
    parser.add_argument("--watch", type=Path, default=None,
                        help="Poll this directory for new wav files")
    parser.add_argument("--http", type=str, default=None, metavar="HOST:PORT",
                        help="serve over HTTP instead: POST /v1/separate "
                        "(wav body -> multi-channel wav), GET /healthz, "
                        "GET /metrics; concurrent requests share micro-"
                        "batched program runs (cli/serve_http.py)")
    parser.add_argument("--http-queue", type=int, default=64,
                        help="pending-request cap before 503 (http mode)")
    parser.add_argument("--http-timeout-s", type=float, default=600.0,
                        help="per-request completion timeout (http mode)")
    parser.add_argument("--poll-s", type=float, default=1.0)
    parser.add_argument("--batch", type=int, default=4,
                        help="Micro-batch size (requests per program run)")
    parser.add_argument("--bucket-s", type=float, default=1.0,
                        help="Length-bucket granularity in seconds")
    parser.add_argument("--warmup-s", type=float, nargs="*", default=[],
                        help="Pre-compile these utterance lengths (seconds)")
    parser.add_argument("-N", type=int, default=None)
    parser.add_argument("--snr", type=float, default=None)
    parser.add_argument("--corrector-steps", type=int, default=None)
    parser.add_argument("--predictor", type=str, default=None,
                        help="default: reverse_diffusion (live model only)")
    parser.add_argument("--corrector", type=str, default=None,
                        help="default: ald2 (live model only)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--once", action="store_true",
                        help="watch mode: process what is there, then exit "
                        "(for tests/cron)")
    args = parser.parse_args(argv)

    if args.http is not None and args.watch is not None:
        raise SystemExit("--http and --watch are mutually exclusive")

    engine = _engine_from_args(args)
    args.output_dir.mkdir(parents=True, exist_ok=True)
    if args.warmup_s:
        engine.warmup(args.warmup_s)

    if args.http is not None:
        from .serve_http import HTTPSeparationServer

        host, _, port = args.http.rpartition(":")
        server = HTTPSeparationServer(
            engine,
            host=host or "127.0.0.1",
            port=int(port),
            max_queue=args.http_queue,
            timeout_s=args.http_timeout_s,
        )
        server.serve_forever()
        return

    if args.watch is not None:
        _watch_loop(engine, args)
        return

    _stdin_loop(engine, args)


MAX_ATTEMPTS = 3


def _watch_loop(engine, args):
    # bookkeeping is keyed by (path, mtime_ns, size) identity, not bare
    # path: a new file re-dropped under a previously processed name gets a
    # fresh identity and is picked up instead of silently skipped
    done = set()  # identities already processed
    attempts: dict = {}  # identity -> failed attempt count
    sizes: dict = {}  # path -> last observed size (copy-stability check)
    while True:
        candidates = []
        idents = {}
        present = set()
        for p in sorted(args.watch.glob("*.wav")):
            # membership in `present` comes from the directory LISTING, not
            # from stat() succeeding: a transient stat error (NFS blip,
            # atomic-rename race) must not prune the path's done/give-up
            # state and trigger a full re-separation on the next poll
            present.add(p)
            try:
                st = p.stat()
            except OSError:  # deleted between glob and stat, or blip
                continue
            ident = (p, st.st_mtime_ns, st.st_size)
            idents[p] = ident
            if ident in done or attempts.get(ident, 0) >= MAX_ATTEMPTS:
                continue
            # only pick up files whose size is stable across two polls —
            # a copy into the drop folder races the poll (in --once mode
            # there is no second poll; tests write atomically)
            if not args.once and sizes.get(p) != st.st_size:
                sizes[p] = st.st_size
                continue
            candidates.append(p)
        # prune bookkeeping for paths no longer in the folder so a
        # serve-forever process does not grow without bound
        done = {d for d in done if d[0] in present}
        attempts = {k: v for k, v in attempts.items() if k[0] in present}
        sizes = {k: v for k, v in sizes.items() if k in present}
        for p, ok, msg in engine.process(candidates, args.output_dir):
            ident = idents[p]
            if ok:
                done.add(ident)
            else:
                # failed files are retried on later polls, up to a cap —
                # a transient device/IO error must not blacklist a request
                attempts[ident] = attempts.get(ident, 0) + 1
                if attempts[ident] >= MAX_ATTEMPTS:
                    msg += f" (giving up after {MAX_ATTEMPTS} attempts)"
            print(("DONE" if ok else "ERROR"), p, msg, flush=True)
        if args.once:
            return
        time.sleep(args.poll_s)


def _stdin_loop(engine, args):
    """stdin line protocol with micro-batching: after a blocking read of
    one request, drain whatever further lines are already pending (up to
    --batch) so concurrent submitters share one compiled program run.

    Reads the fd directly (os.read): readline() would pull several pending
    lines into Python's text-layer buffer where select() cannot see them,
    so a writer sending many lines in one write (pipe open) would degrade
    to singleton batches."""
    import os
    import select

    fd = sys.stdin.fileno()
    state = {"buf": b"", "eof": False}
    lines: list = []

    def pull(block: bool) -> None:
        """Read from the fd, appending complete lines to `lines`."""
        if state["eof"]:
            return
        if not block:
            ready, _, _ = select.select([fd], [], [], 0.05)
            if not ready:
                return
        chunk = os.read(fd, 65536)
        if not chunk:
            state["eof"] = True
            if state["buf"]:  # final line without trailing newline
                lines.append(state["buf"].decode(errors="replace").strip())
                state["buf"] = b""
            return
        state["buf"] += chunk
        *complete, state["buf"] = state["buf"].split(b"\n")
        lines.extend(c.decode(errors="replace").strip() for c in complete)

    while not (state["eof"] and not lines):
        if not lines:
            pull(block=True)
            continue
        # top up the batch from input that is already pending
        while sum(1 for l in lines if l) < args.batch and not state["eof"]:
            before = (len(lines), len(state["buf"]))
            pull(block=False)
            if (len(lines), len(state["buf"])) == before:
                break  # nothing further ready right now
        paths = []
        while lines and len(paths) < args.batch:
            l = lines.pop(0)
            if l:
                paths.append(l)
        if not paths:
            continue
        for p, ok, msg in engine.process(paths, args.output_dir):
            print(("DONE" if ok else "ERROR"), p, msg, flush=True)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
