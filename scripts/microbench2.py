#!/usr/bin/env python
"""In-program per-op microbenchmarks: each op is chained K times inside one
jitted lax.scan so the ~5 ms host-dispatch latency of the remote TPU
tunnel amortizes away (scripts/microbench.py measures per-program launch
cost, not op cost — every small op reads ~5.4 ms there).

The carry feeds each iteration's input (x + tiny*f(x)) so XLA cannot CSE
the repeated op.

Run: python scripts/microbench2.py [batch]
"""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from diffsep_tpu.compilation_cache import enable as _enable_cache

_enable_cache()

K = 50


def sync(x):
    jax.block_until_ready(x)


def timeit_chained(name, op, x, iters=3):
    """op: shape-preserving fn. Returns per-application ms."""

    @jax.jit
    def run(x):
        def body(c, _):
            y = op(c)
            if y.shape != c.shape:  # pad/trim trailing axis (istft crop)
                d = c.shape[-1] - y.shape[-1]
                if d > 0:
                    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, d)])
                else:
                    y = y[..., : c.shape[-1]]
            return c + 1e-6 * y.astype(c.dtype), ()

        out, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(out.astype(jnp.float32))

    sync(run(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = run(x)
    sync(s)
    ms = (time.perf_counter() - t0) / iters / K * 1e3
    print(f"{name:48s} {ms:8.3f} ms/op", flush=True)
    return ms


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    from diffsep_tpu.ops.resampling import downsample_2d, upsample_2d
    from diffsep_tpu.ops.stft import istft, stft

    n = 5 * 8000

    # frontend pair: istft(stft(x)) is shape-preserving
    sig = jnp.asarray(rng.standard_normal((B, 3, n + 382)), jnp.float32)
    timeit_chained("stft+istft pair 510/128 (B,3,5s)", lambda x: istft(stft(x))[..., : x.shape[-1]], sig)

    k = [1.0, 3.0, 3.0, 1.0]
    shapes = [(B, 256, 320, 128), (B, 128, 160, 128), (B, 64, 80, 256),
              (B, 32, 40, 256), (B, 16, 20, 256)]
    for s in shapes:
        x = jnp.asarray(rng.standard_normal(s), dt)
        pair = lambda x: downsample_2d(
            upsample_2d(x, k, data_format="NHWC"), k, data_format="NHWC"
        )
        timeit_chained(f"up+down pair {s}", pair, x)

    x = jnp.asarray(rng.standard_normal((B, 256, 320, 128)), dt)
    w = jnp.asarray(rng.standard_normal((3, 3, 128, 128)), dt) * 0.01
    timeit_chained(
        "conv3x3 256x320x128->128",
        lambda x: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ),
        x,
    )

    import flax.linen as nn

    gn = nn.GroupNorm(num_groups=32, epsilon=1e-6)
    xf = jnp.asarray(rng.standard_normal((B, 256, 320, 128)), jnp.float32)
    gn_p = jax.jit(gn.init)(jax.random.PRNGKey(0), xf)
    timeit_chained("groupnorm 256x320x128 (f32)", lambda x: gn.apply(gn_p, x), xf)

    # our custom GroupNorm with f32 stats on bf16 activations
    from diffsep_tpu.models.layers import AttnBlockpp
    from diffsep_tpu.models.layers import GroupNorm as GroupNormF32

    gn2 = GroupNormF32(num_groups=32, epsilon=1e-6)
    xb = jnp.asarray(rng.standard_normal((B, 256, 320, 128)), dt)
    gn2_p = jax.jit(gn2.init)(jax.random.PRNGKey(0), xb)
    timeit_chained("GroupNormF32 256x320x128 (bf16)", lambda x: gn2.apply(gn2_p, x), xb)

    # groupnorm + swish as appears in ResnetBlock
    timeit_chained(
        "groupnorm+swish 256x320x128 (bf16)",
        lambda x: jax.nn.silu(gn2.apply(gn2_p, x)), xb,
    )

    xa = jnp.asarray(rng.standard_normal((B, 16, 20, 256)), dt)
    attn = AttnBlockpp(skip_rescale=True)
    ap = jax.jit(attn.init)(jax.random.PRNGKey(0), xa)
    timeit_chained("attention 16x20x256", lambda x: attn.apply(ap, x), xa)


if __name__ == "__main__":
    main()
