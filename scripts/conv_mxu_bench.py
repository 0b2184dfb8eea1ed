#!/usr/bin/env python
"""Pallas implicit-GEMM conv3x3 vs XLA's native conv at the NCSN++ hot
shapes, scan-chained in ONE program (same method as microbench2.py — the
axon tunnel has a ~5 ms per-program dispatch floor).

Run: python scripts/conv_mxu_bench.py [batch]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from diffsep_tpu.compilation_cache import enable as _enable_cache

_enable_cache()

K = 50


def timeit_chained(name, op, x, flops, iters=3):
    @jax.jit
    def run(x):
        def body(c, _):
            y = op(c)
            return c + 1e-6 * y.astype(c.dtype), ()

        out, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(out.astype(jnp.float32))

    np.asarray(jax.device_get(run(x)))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = run(x)
    np.asarray(jax.device_get(s))
    ms = (time.perf_counter() - t0) / iters / K * 1e3
    mfu = flops / (ms * 1e-3) / 197e12 * 100
    print(f"{name:56s} {ms:8.3f} ms/op  {mfu:5.1f}% MFU", flush=True)
    return ms


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    from diffsep_tpu.ops.pallas.conv3x3 import (
        _conv3x3_pallas,
        conv3x3_reference,
    )

    # NCSN++ level shapes (h, w, c): level0/1 at 128ch, level2+ at 256ch
    shapes = [
        (256, 320, 128),
        (128, 160, 128),
        (64, 80, 256),
        (32, 40, 256),
        (16, 20, 256),
    ]
    for (h, w, c) in shapes:
        x = jnp.asarray(rng.standard_normal((B, h, w, c)), dt)
        k = jnp.asarray(rng.standard_normal((3, 3, c, c)), dt) * 0.05
        flops = 2 * B * h * w * 9 * c * c
        timeit_chained(f"xla    conv3x3 {B}x{h}x{w}x{c}",
                       lambda x, k=k: conv3x3_reference(x, k), x, flops)
        timeit_chained(f"pallas conv3x3 {B}x{h}x{w}x{c}",
                       lambda x, k=k: _conv3x3_pallas(x, k), x, flops)
        timeit_chained(f"pallas im2col  {B}x{h}x{w}x{c}",
                       lambda x, k=k: _conv3x3_pallas(x, k, variant="im2col"),
                       x, flops)


if __name__ == "__main__":
    main()
