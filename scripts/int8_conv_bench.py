#!/usr/bin/env python
"""Is int8 MXU worth an opt-in quantized inference mode?

Times the NCSN++ level-0 conv3x3 as bf16 vs int8 (both operands int8,
f32 scales applied outside), and the quantize pass itself, chained in one
program (scan) so the remote-tunnel dispatch floor amortizes.

v5e int8 peak is ~2x bf16; the conv is compute-bound at ~49-57% MFU, so a
working int8 path bounds at ~2x conv time. This script measures what XLA
actually delivers before any product work.

Run: python scripts/int8_conv_bench.py [batch]
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

K = 30


def timeit_chained(name, op, x, flop=None, iters=3):
    @jax.jit
    def run(x):
        def body(c, _):
            y = op(c)
            return c + (1e-6 * y.astype(jnp.float32)).astype(c.dtype), ()

        out, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(out.astype(jnp.float32))

    np.asarray(jax.device_get(run(x)))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = run(x)
        np.asarray(jax.device_get(s))
    ms = (time.perf_counter() - t0) / iters / K * 1e3
    extra = ""
    if flop:
        extra = f"  {flop / (ms * 1e-3) / 197e12 * 100:5.1f}% of bf16 peak"
    print(f"{name:32s} {ms:8.3f} ms/op{extra}", flush=True)
    return ms


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    H, W, C = 256, 320, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)), jnp.bfloat16) * 0.01
    flop = 2 * B * H * W * 9 * C * C

    def conv_bf16(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    timeit_chained("conv bf16", conv_bf16, x, flop)

    w8 = jnp.asarray(
        np.clip(np.round(np.asarray(w, np.float32) * 127 / 0.04), -127, 127),
        jnp.int8,
    )

    def conv_int8(x):
        # dynamic per-tensor activation quant + int8 conv + dequant
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        scale = amax / 127.0
        x8 = jnp.clip(
            jnp.round(x.astype(jnp.float32) / scale), -127, 127
        ).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            x8, w8, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return (y.astype(jnp.float32) * (scale * 0.04 / 127.0)).astype(
            jnp.bfloat16
        )

    timeit_chained("conv int8 (quant+conv+dequant)", conv_int8, x, flop)

    def conv_int8_only(x8):
        return jax.lax.conv_general_dilated(
            x8, w8, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        ).astype(jnp.int8)

    x8 = jnp.asarray(
        np.clip(rng.standard_normal((B, H, W, C)) * 40, -127, 127), jnp.int8
    )
    timeit_chained("conv int8 (pre-quantized)", conv_int8_only, x8, flop)


if __name__ == "__main__":
    main()
