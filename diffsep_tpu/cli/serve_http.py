"""HTTP front for the separation service (stdlib-only).

Third front-end on the compile-once micro-batching engine in cli/serve.py
(stdin line protocol and --watch drop-folder are the other two). No
reference counterpart — the reference only ships batch CLIs; this is the
network-facing deployment shape:

  * ``POST /v1/separate`` with a wav body returns one multi-channel wav
    (channel i = separated source i), synchronously.
  * Requests from CONCURRENT connections share compiled program runs: all
    handler threads enqueue into one worker which drains whatever is
    pending, groups it by length bucket, and runs micro-batches of up to
    ``engine.batch`` — the natural batching window is the previous batch's
    device time, so steady-state load serves at full batch occupancy
    without a tuned delay parameter.
  * ``GET /healthz`` for liveness probes, ``GET /metrics`` for
    Prometheus-format counters (request/error totals, latency, batch
    occupancy, queue depth).

Only the worker thread touches JAX; handler threads do wav decode/encode
and waiting. Built on ``http.server.ThreadingHTTPServer`` — zero
dependencies beyond the scientific stack already required.
"""
from __future__ import annotations

import json
import logging
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..data.audio_io import load_wav_bytes, wav_to_bytes

log = logging.getLogger(__name__)

__all__ = ["HTTPSeparationServer"]


class _Metrics:
    """Prometheus text-format counters (thread-safe)."""

    def __init__(self):
        self._lock = threading.Lock()
        self.requests_ok = 0
        self.requests_error = 0  # 4xx/5xx, incl. timeouts
        self.latency_sum = 0.0  # seconds, accepted requests only
        self.latency_count = 0
        self.batch_fill_sum = 0  # real rows per program run
        self.batch_runs = 0

    def observe_result(self, ok: bool, latency_s: float | None = None):
        with self._lock:
            if ok:
                self.requests_ok += 1
            else:
                self.requests_error += 1
            if latency_s is not None:
                self.latency_sum += latency_s
                self.latency_count += 1

    def observe_run(self, fill: int):
        with self._lock:
            self.batch_fill_sum += fill
            self.batch_runs += 1

    def render(self, queue_depth: int, inflight: int) -> str:
        with self._lock:
            lines = [
                "# TYPE diffsep_requests_total counter",
                f'diffsep_requests_total{{status="ok"}} {self.requests_ok}',
                f'diffsep_requests_total{{status="error"}} '
                f"{self.requests_error}",
                "# TYPE diffsep_request_latency_seconds summary",
                f"diffsep_request_latency_seconds_sum {self.latency_sum:.6f}",
                f"diffsep_request_latency_seconds_count {self.latency_count}",
                "# TYPE diffsep_batch_fill summary",
                f"diffsep_batch_fill_sum {self.batch_fill_sum}",
                f"diffsep_batch_fill_count {self.batch_runs}",
                "# TYPE diffsep_queue_depth gauge",
                f"diffsep_queue_depth {queue_depth}",
                "# TYPE diffsep_inflight gauge",
                f"diffsep_inflight {inflight}",
            ]
        return "\n".join(lines) + "\n"


class _Pending:
    """One enqueued request: the validated signal in, the estimate (or an
    error) out, handed back to the handler thread via `done`."""

    __slots__ = ("wav", "done", "est", "error", "t_enqueue")

    def __init__(self, wav: np.ndarray):
        self.wav = wav
        self.done = threading.Event()
        self.est = None  # (n_src, n) on success
        self.error = None  # message string on failure
        self.t_enqueue = time.perf_counter()


class HTTPSeparationServer:
    """Wrap a serving engine (SeparationEngine or ArtifactEngine) in an
    HTTP server with cross-connection micro-batching.

    Use as a context manager or call `start()` / `shutdown()`. `port=0`
    binds an ephemeral port; read the bound one from `.port`.
    """

    def __init__(
        self,
        engine,
        host: str = "127.0.0.1",
        port: int = 8000,
        max_queue: int = 64,
        timeout_s: float = 600.0,
    ):
        self.engine = engine
        self.metrics = _Metrics()
        self.timeout_s = timeout_s
        self._queue: queue.Queue[_Pending] = queue.Queue(maxsize=max_queue)
        self._inflight = 0
        self._inflight_lock = threading.Lock()
        self._t_start = time.time()
        self._stop = threading.Event()
        self._worker = threading.Thread(
            target=self._worker_loop, name="diffsep-batcher", daemon=True
        )
        handler = _make_handler(self)

        class _Server(ThreadingHTTPServer):
            daemon_threads = True
            # listen backlog: the http.server default of 5 drops the final
            # handshake ACK under a connect burst (>5 simultaneous clients)
            # and the kernel answers the client's first write with RST —
            # measured in scripts/serve_soak.py at 16 concurrent clients as
            # client-side 'Connection reset by peer' with a clean server
            # (2/192 requests). Size it to the request queue: anything the
            # server is willing to hold in flight it must also accept.
            request_queue_size = max(128, max_queue)

        self._httpd = _Server((host, port), handler)
        self._serve_thread: threading.Thread | None = None
        self._listening = False  # BaseServer.shutdown() deadlocks unless
        # serve_forever() is actually running; track it ourselves

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> "HTTPSeparationServer":
        """Start the batching worker and the HTTP listener (background
        threads); returns self."""
        self._worker.start()
        self._listening = True
        self._serve_thread = threading.Thread(
            target=self._httpd.serve_forever, name="diffsep-http", daemon=True
        )
        self._serve_thread.start()
        log.info("http: serving on %s:%d", *self._httpd.server_address[:2])
        return self

    def serve_forever(self) -> None:
        """Blocking variant for the CLI: start the worker, serve until
        interrupted."""
        self._worker.start()
        self._listening = True
        log.info("http: serving on %s:%d", *self._httpd.server_address[:2])
        try:
            self._httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            self._listening = False
            self.shutdown()

    def shutdown(self) -> None:
        self._stop.set()
        if self._listening:
            self._listening = False
            self._httpd.shutdown()
        self._httpd.server_close()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.shutdown()

    # -- request path ------------------------------------------------------

    def submit(self, wav: np.ndarray) -> _Pending:
        """Enqueue a validated (1, n) signal; raises queue.Full when the
        server is saturated (handler maps it to 503)."""
        pending = _Pending(wav)
        self._queue.put_nowait(pending)
        return pending

    def _worker_loop(self) -> None:
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.2)
            except queue.Empty:
                continue
            batch = [first]
            # drain what accumulated while the previous batch computed;
            # cap at a few program runs' worth so latency stays bounded
            while len(batch) < 4 * self.engine.batch:
                try:
                    batch.append(self._queue.get_nowait())
                except queue.Empty:
                    break
            with self._inflight_lock:
                self._inflight += len(batch)
            try:
                self._run_batch(batch)
            finally:
                with self._inflight_lock:
                    self._inflight -= len(batch)

    def _run_batch(self, batch: list[_Pending]) -> None:
        groups: dict[int, list[_Pending]] = {}
        for p in batch:
            b = -(-p.wav.shape[-1] // self.engine.bucket)
            groups.setdefault(b, []).append(p)
        chunks = []
        for _, group in sorted(groups.items()):
            for off in range(0, len(group), self.engine.batch):
                chunks.append(group[off : off + self.engine.batch])

        def settle(chunk, run) -> None:
            """Resolve one chunk's pendings from `run()`; failures stay
            chunk-local (the reason the dispatch/finalize calls are inside
            this one try)."""
            try:
                for p, est in zip(chunk, run()):
                    p.est = est
            except Exception as e:  # pragma: no cover - device faults
                log.exception("http: micro-batch failed")
                for p in chunk:
                    p.error = f"{type(e).__name__}: {e}"
            self.metrics.observe_run(len(chunk))
            for p in chunk:
                p.done.set()

        dispatch = getattr(self.engine, "_dispatch_bucket", None)
        if dispatch is None:  # engine exposes only the sync call
            for chunk in chunks:
                settle(chunk, lambda c=chunk: self.engine._run_bucket(
                    [p.wav for p in c]
                ))
            return

        # depth-1 pipeline: dispatch chunk k+1 before finalizing chunk k —
        # the D2H transfer of k overlaps k+1's compute (see
        # serve._EngineBase docstring for the measured win)
        pending = None  # (chunk, handle)
        for chunk in chunks:
            try:
                handle = dispatch([p.wav for p in chunk])
            except Exception as e:
                if pending is not None:
                    settle(pending[0],
                           lambda h=pending[1]: self.engine._finalize_bucket(h))
                    pending = None
                log.exception("http: micro-batch dispatch failed")
                for p in chunk:
                    p.error = f"{type(e).__name__}: {e}"
                self.metrics.observe_run(len(chunk))
                for p in chunk:
                    p.done.set()
                continue
            if pending is not None:
                settle(pending[0],
                       lambda h=pending[1]: self.engine._finalize_bucket(h))
            pending = (chunk, handle)
        if pending is not None:
            settle(pending[0],
                   lambda h=pending[1]: self.engine._finalize_bucket(h))


def _make_handler(server: HTTPSeparationServer):
    engine = server.engine

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        # route table -------------------------------------------------
        def do_GET(self):
            if self.path in ("/healthz", "/health"):
                self._send_json(
                    200,
                    {
                        "status": "ok",
                        "fs": engine.fs,
                        "batch": engine.batch,
                        "bucket_samples": engine.bucket,
                        "max_samples": engine.max_samples,
                        "engine": type(engine).__name__,
                        "uptime_s": round(time.time() - server._t_start, 3),
                    },
                )
            elif self.path == "/metrics":
                body = server.metrics.render(
                    server._queue.qsize(), server._inflight
                ).encode()
                self._send_bytes(200, body, "text/plain; version=0.0.4")
            else:
                self._send_json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if self.path not in ("/v1/separate", "/separate"):
                # body not read: under HTTP/1.1 keep-alive the unread wav
                # bytes would be parsed as the next request line, breaking
                # the connection for subsequent legitimate requests
                self.close_connection = True
                self._send_json(404, {"error": f"no route {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
            except ValueError:
                length = 0
            if length <= 0:
                self.close_connection = True  # body length unknown/unread
                self._send_json(
                    400, {"error": "empty body; POST wav bytes"}
                )
                return
            body = self.rfile.read(length)
            try:
                wav, sr = load_wav_bytes(body)
            except Exception as e:
                self._send_json(
                    400, {"error": f"wav decode failed: {e}"}
                )
                return
            wav = np.asarray(wav, np.float32)
            err = engine.validate(wav, sr)
            if err is not None:
                self._send_json(400, {"error": err})
                return
            try:
                pending = server.submit(wav)
            except queue.Full:
                self._send_json(
                    503, {"error": "server saturated; retry later"}
                )
                return
            if not pending.done.wait(server.timeout_s):
                # the worker may still complete it later; the slot is
                # abandoned but counted
                self._send_json(
                    504,
                    {"error": f"timed out after {server.timeout_s:.0f}s"},
                )
                return
            if pending.error is not None:
                self._send_json(500, {"error": pending.error})
                return
            latency = time.perf_counter() - pending.t_enqueue
            payload = wav_to_bytes(pending.est, engine.fs)
            self._send_bytes(
                200,
                payload,
                "audio/wav",
                extra={
                    "X-Diffsep-Sources": str(pending.est.shape[0]),
                    "X-Diffsep-Latency-Ms": f"{latency * 1e3:.1f}",
                },
                ok_metric=latency,
            )

        # helpers ------------------------------------------------------
        def _send_bytes(
            self, code, body, ctype, extra=None, ok_metric=None
        ):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            if self.close_connection:
                # tell the client the socket will not be reused (set on
                # early-return paths that never read the request body)
                self.send_header("Connection", "close")
            for k, v in (extra or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)
            if ok_metric is not None:
                server.metrics.observe_result(True, ok_metric)

        def _send_json(self, code, obj):
            body = (json.dumps(obj) + "\n").encode()
            self._send_bytes(code, body, "application/json")
            if code >= 400:
                server.metrics.observe_result(False)

        def log_message(self, fmt, *args):  # route through logging
            log.debug("http: %s", fmt % args)

    return Handler
