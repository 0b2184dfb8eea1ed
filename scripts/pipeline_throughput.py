#!/usr/bin/env python
"""Measure pipelined (steady-state) serving throughput vs the bench's
sequential dispatch+sync loop.

bench.py times `dispatch -> device_get` per batch, so the device sits idle
while the separated audio (batch 64 x 2 x 40000 f32 ~= 20 MB) crosses the
axon tunnel back to the host.  A server overlaps that: dispatch batch k+1
(async, JAX enqueues without blocking), THEN device_get batch k — the D2H
transfer rides the DMA engines while the next batch computes.  The win is
bounded by transfer_time / step_time, so it matters most at the fastest
operating points (DDIM N=2: ~0.6 s/step; N=30: ~14 s/step, negligible).

Run:  python scripts/pipeline_throughput.py [--n 6] [--batch 64]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from diffsep_tpu.compilation_cache import enable as _enable_cache

_enable_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=6, help="iters per mode")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--points", default="2:log,6:none",
                    help="comma list of N:schedule[:pc] operating points — "
                    "the optional third field 'pc' uses the graded "
                    "reverse_diffusion/ald2 sampler instead of ddim/none "
                    "(e.g. 30:none:pc re-checks the N=30 peak batch under "
                    "pipelining, VERDICT r4 item 4)")
    args = ap.parse_args()

    from diffsep_tpu.config import compose
    from diffsep_tpu.model import DiffSepModel

    cfg = compose([
        "experiment=icassp-separation",
        "model.score_model.backbone_args.dtype=bfloat16",
    ])
    model = DiffSepModel(cfg)
    fs = 8000
    rng = np.random.default_rng(0)
    mix = jnp.asarray(
        rng.standard_normal((args.batch, 1, 5 * fs)), jnp.float32
    ) * 0.1
    tgt = jnp.zeros((args.batch, 2, 5 * fs), jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0), mix, tgt)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(params)[0]))

    out = {}
    for point in args.points.split(","):
        fields = point.split(":")
        n_str, sched = fields[0], fields[1]
        pc = len(fields) > 2 and fields[2] == "pc"
        N = int(n_str)
        schedule = None if sched == "none" else sched
        if pc:
            kw = dict(predictor_name="reverse_diffusion",
                      corrector_name="ald2", N=N, schedule=schedule)
        else:
            kw = dict(predictor_name="ddim", corrector_name="none", N=N,
                      schedule=schedule)

        def run(seed):
            est, _ = model.separate(params, jax.random.PRNGKey(seed), mix,
                                    **kw)
            return est

        np.asarray(jax.device_get(run(0)))  # compile
        print(f"N={N} ({sched}): compiled", flush=True)

        # sequential: dispatch -> full host sync, per batch (bench.py mode)
        t0 = time.perf_counter()
        for i in range(args.n):
            np.asarray(jax.device_get(run(100 + i)))
        seq = args.batch * args.n / (time.perf_counter() - t0)

        # pipelined: dispatch k+1 BEFORE syncing k (depth-1 pipeline)
        pending = run(200)
        t0 = time.perf_counter()
        for i in range(args.n):
            nxt = run(201 + i)
            np.asarray(jax.device_get(pending))
            pending = nxt
        pipe = args.batch * args.n / (time.perf_counter() - t0)
        np.asarray(jax.device_get(pending))

        # device-only: sync a scalar reduction instead of the waveforms —
        # isolates how much of the gap is the D2H transfer itself
        t0 = time.perf_counter()
        for i in range(args.n):
            np.asarray(jax.device_get(run(300 + i).sum()))
        dev = args.batch * args.n / (time.perf_counter() - t0)

        key = f"{'pc' if pc else 'ddim'}_N{N}_{sched}_b{args.batch}"
        out[key] = {
            "sequential_utt_s": round(seq, 2),
            "pipelined_utt_s": round(pipe, 2),
            "scalar_sync_utt_s": round(dev, 2),
            "pipeline_speedup": round(pipe / seq, 3),
        }
        print(json.dumps({key: out[key]}), flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
