#!/usr/bin/env python
"""Conv3x3 lowering experiments at the NCSN++ level-0 shape.

The level-0 3x3 convs are ~87% of forward FLOPs and XLA's native conv
lands at ~57% MFU (scripts/microbench2.py). Tests alternative
formulations inside one program (scan-chained, so the remote-tunnel
dispatch floor amortizes):

  conv          lax.conv_general_dilated NHWC (shipped)
  conv_f32acc   same with preferred_element_type=f32 then cast
  shift9        sum of 9 shifted (HW,C)@(C,C) matmuls on a padded input
  widef         conv expressed with W folded into lanes? (skipped: layout)

Run: python scripts/conv_experiments.py [batch]
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


def timeit_chained(name, op, x, flop, iters=3):
    @jax.jit
    def run(x):
        def body(c, _):
            y = op(c)
            return c + 1e-6 * y.astype(c.dtype), ()

        out, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(out.astype(jnp.float32))

    np.asarray(jax.device_get(run(x)))  # axon: block_until_ready lies
    t0 = time.perf_counter()
    for _ in range(iters):
        s = run(x)
        np.asarray(jax.device_get(s))
    ms = (time.perf_counter() - t0) / iters / K * 1e3
    mfu = flop / (ms * 1e-3) / 197e12 * 100
    print(f"{name:24s} {ms:8.3f} ms/op   {mfu:5.1f}% MFU", flush=True)
    return ms


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    H, W, C = 256, 320, 128
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), dt)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)), dt) * 0.01
    flop = 2 * B * H * W * 9 * C * C

    def conv(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    timeit_chained("conv (shipped)", conv, x, flop)

    def conv_f32(x):
        return jax.lax.conv_general_dilated(
            x,
            w,
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(dt)

    timeit_chained("conv f32-acc", conv_f32, x, flop)

    def shift9(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for dy in range(3):
            for dx in range(3):
                xs = xp[:, dy : dy + H, dx : dx + W, :]
                y = jax.lax.dot_general(
                    xs,
                    w[dy, dx],
                    dimension_numbers=(((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = y if acc is None else acc + y
        return acc.astype(dt)

    timeit_chained("shift9 matmul", shift9, x, flop)

    # batched-matmul view: collapse B,H into one dim, keep W,C
    def shift9_flat(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for dy in range(3):
            for dx in range(3):
                xs = xp[:, dy : dy + H, dx : dx + W, :].reshape(B * H * W, C)
                y = jnp.dot(xs, w[dy, dx], preferred_element_type=jnp.float32)
                acc = y if acc is None else acc + y
        return acc.reshape(B, H, W, C).astype(dt)

    timeit_chained("shift9 flat matmul", shift9_flat, x, flop)


if __name__ == "__main__":
    main()
