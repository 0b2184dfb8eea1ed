#!/usr/bin/env python
"""Peak-memory comparison: naive vs blockwise attention at long signal
lengths, on the flagship nf=128 score model.

The attention level's (HW, HW) score matrix is the quadratic term that made
the round-3 sequence-parallel probe useless (per-device peak unchanged under
sp input sharding — ROADMAP). This measures what blockwise attention
(models/layers.py:blockwise_attention) buys: compile the jitted score-model
forward for both paths at several utterance lengths and print XLA's
memory_analysis (argument/output/temp/peak bytes). No execution needed.

Usage: python scripts/attn_memory.py [--lengths 15,30,60] [--batch 1]
"""
import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lengths", default="15,30,60",
                    help="utterance lengths in seconds, comma-separated")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--nf", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from diffsep_tpu.compilation_cache import enable

    enable()
    from diffsep_tpu.config import compose
    from diffsep_tpu.model import DiffSepModel

    cfg = compose([
        "experiment=icassp-separation",
        f"model.score_model.backbone_args.nf={args.nf}",
        f"model.score_model.backbone_args.dtype={args.dtype}",
    ])
    model = DiffSepModel(cfg)
    fs = 8000
    rng = np.random.default_rng(0)

    n5 = 5 * fs
    mix5 = jnp.asarray(rng.standard_normal((args.batch, 1, n5)), jnp.float32)
    tgt5 = jnp.zeros((args.batch, 2, n5), jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0), mix5, tgt5)

    results = []
    for sec in [float(s) for s in args.lengths.split(",")]:
        n = int(sec * fs)
        x = jax.ShapeDtypeStruct((args.batch, 2, n), jnp.float32)
        t = jax.ShapeDtypeStruct((args.batch,), jnp.float32)
        m = jax.ShapeDtypeStruct((args.batch, 1, n), jnp.float32)
        for mode, env in [("naive", "0"), ("blockwise", "1")]:
            os.environ["DIFFSEP_ATTN_BLOCKWISE"] = env
            try:
                compiled = (
                    jax.jit(model.score_apply)
                    .lower(params, x, t, m)
                    .compile()
                )
                ma = compiled.memory_analysis()
                row = {
                    "len_s": sec,
                    "mode": mode,
                    "temp_mb": round(ma.temp_size_in_bytes / 2**20, 1),
                    "peak_mb": round(
                        getattr(ma, "peak_memory_in_bytes", 0) / 2**20, 1
                    ),
                    "argument_mb": round(
                        ma.argument_size_in_bytes / 2**20, 1
                    ),
                }
            except Exception as e:  # OOM during compile etc.
                row = {"len_s": sec, "mode": mode,
                       "error": f"{type(e).__name__}: {e}"[:200]}
            print(json.dumps(row), flush=True)
            results.append(row)

    # summary: blockwise win factor on temp memory per length
    by_len = {}
    for r in results:
        by_len.setdefault(r["len_s"], {})[r["mode"]] = r
    for sec, d in sorted(by_len.items()):
        if "temp_mb" in d.get("naive", {}) and "temp_mb" in d.get(
            "blockwise", {}
        ):
            ratio = d["naive"]["temp_mb"] / max(d["blockwise"]["temp_mb"], 1e-9)
            print(f"# {sec:5.1f}s: naive {d['naive']['temp_mb']} MB -> "
                  f"blockwise {d['blockwise']['temp_mb']} MB "
                  f"({ratio:.2f}x)", file=sys.stderr)


if __name__ == "__main__":
    main()
