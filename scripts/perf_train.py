#!/usr/bin/env python
"""Training-step performance matrix on the real TPU chip.

Measures ms/step + MFU for the icassp-separation recipe across the
performance levers (compute dtype, remat, Pallas kernels, batch size) to
decide which to ship as defaults. Reference hot loop:
/root/reference/models/ncsnpp.py:319-478 driven by pl_model.py training_step.

Run: python scripts/perf_train.py [variant ...]
Variants: f32-remat bf16-remat bf16-noremat bf16-remat-pallas ...
Default: the full matrix at batches 6 and 16.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from diffsep_tpu.compilation_cache import enable as _enable_cache

_enable_cache()

# TPU v5e (v5 lite) peak: 197 TFLOP/s bf16, 98.5 TFLOP/s f32 is not a real
# mode (MXU computes bf16 inputs/f32 accumulate); use 197e12 for MFU in both
# cases since f32 convs run as multi-pass bf16 on the MXU.
PEAK_FLOPS = 197e12


def sync(x):
    jax.block_until_ready(x)


def build(dtype: str, remat: bool):
    from diffsep_tpu.config import compose
    from diffsep_tpu.model import DiffSepModel

    overrides = [
        "experiment=icassp-separation",
        f"model.score_model.backbone_args.dtype={dtype}",
        f"model.score_model.backbone_args.remat={str(remat).lower()}",
    ]
    cfg = compose(overrides)
    return DiffSepModel(cfg)


def measure(name: str, dtype: str, remat: bool, batch: int, iters: int = 8):
    model = build(dtype, remat)
    fs = 8000
    n = 5 * fs
    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.standard_normal((batch, 2, n)), jnp.float32) * 0.1
    mix = tgt.sum(axis=1, keepdims=True)
    state = model.init_state(jax.random.PRNGKey(0), mix, tgt)
    sync(jax.tree_util.tree_leaves(state.params)[0])

    step = jax.jit(model.make_train_step(jax.random.PRNGKey(1)), donate_argnums=(0,))

    flops = None
    try:
        cost = step.lower(state, mix, tgt).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = cost.get("flops", None)
    except Exception as e:
        print(f"  cost analysis failed: {e}", file=sys.stderr)

    t0 = time.perf_counter()
    state, m = step(state, mix, tgt)
    sync(m["train/score_loss"])
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, mix, tgt)
    sync(m["train/score_loss"])
    ms = (time.perf_counter() - t0) / iters * 1e3

    mfu = (flops / (ms / 1e3)) / PEAK_FLOPS * 100 if flops else float("nan")
    print(
        f"{name:28s} b={batch:<3d} {ms:8.1f} ms/step   "
        f"{(flops or 0)/1e12:6.2f} TFLOP   MFU={mfu:5.1f}%   "
        f"(compile+1st {compile_s:.0f}s, loss {float(m['train/score_loss']):.3f})",
        flush=True,
    )
    del state, step
    return ms


def main():
    pallas = os.environ.get("DIFFSEP_PALLAS", "0")
    print(f"DIFFSEP_PALLAS={pallas}", flush=True)
    args = sys.argv[1:]
    matrix = [
        # (name, dtype, remat, batch)
        ("f32 remat (r1 shipped)", "float32", True, 6),
        ("bf16 remat", "bfloat16", True, 6),
        ("bf16 noremat", "bfloat16", False, 6),
        ("bf16 remat", "bfloat16", True, 16),
        ("bf16 noremat", "bfloat16", False, 16),
    ]
    if args:
        sel = set(args)
        matrix = [m for m in matrix if m[0].replace(" ", "-") in sel or str(m[3]) in sel]
    for name, dtype, remat, batch in matrix:
        try:
            measure(name, dtype, remat, batch)
        except Exception as e:
            print(f"{name:28s} b={batch:<3d} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
