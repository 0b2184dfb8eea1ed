#!/usr/bin/env python
"""Concurrent-load soak of the HTTP serving front (VERDICT r4 item 8).

The engine's batching claims — cross-connection micro-batching at full
occupancy under steady load, per-chunk failure isolation — are unit-tested
(tests/test_serve.py), but until this record there was no MEASURED
concurrent-client throughput/latency. This drives the real stack
end-to-end in one process: flagship-architecture model (random-init —
latency/throughput don't depend on the weights' values), SeparationEngine
on the DDIM fast path, HTTPSeparationServer on an ephemeral port, K
client threads each POSTing 5 s wav bodies over persistent HTTP/1.1
connections, then reports p50/p95/mean latency, aggregate throughput, and
the server's own /metrics (batch occupancy, error counters).

Run (TPU):  python scripts/serve_soak.py [--clients 8] [--requests 12]
                [--batch 8] [--n-steps 6] [--schedule none]
Writes scripts/serve_soak_result.json.
"""
import argparse
import http.client
import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from diffsep_tpu.compilation_cache import enable as _enable_cache

_enable_cache()


def client_worker(port, payloads, latencies, errors, barrier):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    barrier.wait()  # all clients open fire together
    for body in payloads:
        t0 = time.perf_counter()
        try:
            conn.request(
                "POST", "/v1/separate", body=body,
                headers={"Content-Type": "audio/wav"},
            )
            resp = conn.getresponse()
            resp.read()
            if resp.status == 200:
                latencies.append(time.perf_counter() - t0)
            else:
                errors.append(resp.status)
        except Exception as e:
            errors.append(f"{type(e).__name__}: {e}")
            conn.close()
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    conn.close()


def scrape_metrics(port):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/metrics")
    text = conn.getresponse().read().decode()
    conn.close()
    out = {}
    for line in text.splitlines():
        if line.startswith("#") or not line.strip():
            continue
        key, val = line.rsplit(" ", 1)
        out[key] = float(val)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=12,
                    help="requests per client")
    ap.add_argument("--batch", type=int, default=8,
                    help="engine micro-batch size")
    ap.add_argument("--n-steps", type=int, default=6)
    ap.add_argument("--schedule", default="none",
                    choices=["none", "linear", "log", "revlog"])
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument(
        "--out", default=str(Path(__file__).parent / "serve_soak_result.json")
    )
    args = ap.parse_args()
    schedule = None if args.schedule == "none" else args.schedule

    import jax

    from diffsep_tpu.cli.serve import SeparationEngine
    from diffsep_tpu.cli.serve_http import HTTPSeparationServer
    from diffsep_tpu.data.audio_io import wav_to_bytes

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __graft_entry__ as g

    model = g._flagship_model(bench_dtype=True)
    fs = int(model.config.model.fs)
    n = int(args.seconds * fs)
    rng = np.random.default_rng(0)
    mix = rng.standard_normal((1, n)).astype(np.float32) * 0.1
    params = model.init_params(
        jax.random.PRNGKey(0),
        np.zeros((1, 1, n), np.float32),
        np.zeros((1, 2, n), np.float32),
    )

    kw = {"N": args.n_steps}
    if schedule is not None:
        kw["schedule"] = schedule
    engine = SeparationEngine(
        model, params, batch=args.batch, bucket_s=args.seconds,
        predictor="ddim", corrector="none", sampler_kwargs=kw,
    )
    print("warmup: compiling the serving bucket...", flush=True)
    engine.warmup([args.seconds])

    # distinct payloads (same length bucket) so wav encode isn't reused
    payload_pool = [
        wav_to_bytes(
            rng.standard_normal((1, n)).astype(np.float32) * 0.1, fs
        )
        for _ in range(8)
    ]

    with HTTPSeparationServer(engine, port=0, max_queue=256) as srv:
        port = srv.port
        print(f"serving on :{port}; soak {args.clients} clients x "
              f"{args.requests} requests", flush=True)
        latencies, errors = [], []
        barrier = threading.Barrier(args.clients + 1)
        threads = [
            threading.Thread(
                target=client_worker,
                args=(
                    port,
                    [payload_pool[(c + i) % len(payload_pool)]
                     for i in range(args.requests)],
                    latencies, errors, barrier,
                ),
            )
            for c in range(args.clients)
        ]
        for t in threads:
            t.start()
        barrier.wait()
        t0 = time.perf_counter()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        metrics = scrape_metrics(port)

    lat = np.sort(np.asarray(latencies))
    total = args.clients * args.requests
    runs = max(metrics.get("diffsep_batch_fill_count", 0), 1)
    result = {
        "clients": args.clients,
        "requests_per_client": args.requests,
        "engine_batch": args.batch,
        "sampler": {"predictor": "ddim", "N": args.n_steps,
                    "schedule": schedule},
        "utterance_s": args.seconds,
        "total_requests": total,
        "ok": int(lat.size),
        "errors": len(errors),
        "wall_s": round(wall, 2),
        "throughput_req_per_s": round(lat.size / wall, 2),
        "latency_p50_s": round(float(np.percentile(lat, 50)), 3),
        "latency_p95_s": round(float(np.percentile(lat, 95)), 3),
        "latency_mean_s": round(float(lat.mean()), 3),
        "latency_max_s": round(float(lat.max()), 3),
        "batch_occupancy_mean": round(
            metrics.get("diffsep_batch_fill_sum", 0.0) / runs, 2
        ),
        "program_runs": int(runs),
        "server_ok": int(metrics.get(
            'diffsep_requests_total{status="ok"}', 0)),
        "server_errors": int(metrics.get(
            'diffsep_requests_total{status="error"}', 0)),
    }
    if errors:
        result["error_samples"] = [str(e) for e in errors[:5]]
    print(json.dumps(result), flush=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
