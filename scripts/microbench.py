#!/usr/bin/env python
"""Per-op microbenchmarks on the TPU: where does the NCSN++ forward spend
its time? Used to decide which ops deserve Pallas kernels.

Run: python scripts/microbench.py
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


def sync(x):
    np.asarray(jax.device_get(x))


def timeit(name, fn, *args, iters=5):
    # reduce the output to ONE scalar on-device before the host sync:
    # device_get of a full-size output measures the host tunnel, not the op
    # (a 336 MB upsample output costs seconds to fetch and used to dwarf
    # the op itself)
    leaves = lambda out: jax.tree_util.tree_leaves(out)[0]
    red = jax.jit(lambda *a: jnp.sum(leaves(fn(*a)).astype(jnp.float32)))
    out = red(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = red(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:45s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    from diffsep_tpu.ops.resampling import downsample_2d, upsample_2d
    from diffsep_tpu.ops.stft import istft, stft

    # full score-model forward for reference
    from diffsep_tpu.config import compose
    from diffsep_tpu.model import DiffSepModel

    cfg = compose([
        "experiment=icassp-separation",
        "model.score_model.backbone_args.dtype=bfloat16",
    ])
    model = DiffSepModel(cfg)
    n = 5 * 8000
    mix = jnp.asarray(rng.standard_normal((B, 1, n)), jnp.float32) * 0.1
    xt = jnp.asarray(rng.standard_normal((B, 2, n)), jnp.float32) * 0.1
    t = jnp.full((B,), 0.5)
    params = model.init_params(jax.random.PRNGKey(0), mix, xt)
    sync(jax.tree_util.tree_leaves(params)[0])

    fwd = jax.jit(lambda p, x, tt, m: model.score_apply(p, x, tt, m))
    try:
        cost = fwd.lower(params, xt, t, mix).compile().cost_analysis()
        if isinstance(cost, list): cost = cost[0]
        print(f"XLA cost: {cost.get('flops', 0)/1e9:.1f} GFLOP, "
              f"{cost.get('bytes accessed', 0)/1e9:.2f} GB accessed", flush=True)
    except Exception as e:
        print("cost analysis unavailable:", e, flush=True)
    total = timeit(f"score forward (B={B})", fwd, params, xt, t, mix)

    # STFT frontend
    sig = jnp.asarray(rng.standard_normal((B, 3, n + 382)), jnp.float32)
    # complex64 device_get is unimplemented on some backends: sync |.|
    jstft = jax.jit(lambda x: jnp.abs(stft(x)))
    timeit("stft 510/128 (abs)", jstft, sig)
    spec = stft(jnp.zeros((B, 3, n + 382)))  # traced value only
    timeit("istft 510/128", jax.jit(lambda x: istft(stft(x))), sig)

    # resampling at each U-Net level (NHWC)
    shapes = [(B, 256, 320, 128), (B, 128, 160, 128), (B, 64, 80, 256),
              (B, 32, 40, 256), (B, 16, 20, 256), (B, 8, 10, 256)]
    k = [1.0, 3.0, 3.0, 1.0]
    tot_resamp = 0.0
    for s in shapes:
        x = jnp.asarray(rng.standard_normal(s), dt)
        d = timeit(
            f"downsample_2d {s}",
            jax.jit(lambda x: downsample_2d(x, k, data_format="NHWC")), x)
        u = timeit(
            f"upsample_2d   {s}",
            jax.jit(lambda x: upsample_2d(x, k, data_format="NHWC")), x)
        tot_resamp += d + u

    # one big conv3x3 at full resolution
    x = jnp.asarray(rng.standard_normal((B, 256, 320, 128)), dt)
    w = jnp.asarray(rng.standard_normal((3, 3, 128, 128)), dt) * 0.01
    conv = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
    timeit("conv3x3 256x320x128->128", conv, x, w)

    # GroupNorm f32 at full resolution
    import flax.linen as nn
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-6)
    xf = jnp.asarray(rng.standard_normal((B, 256, 320, 128)), jnp.float32)
    gn_p = jax.jit(gn.init)(jax.random.PRNGKey(0), xf)
    timeit("groupnorm 256x320x128 (f32)",
           jax.jit(lambda p, x: gn.apply(p, x)), gn_p, xf)

    # attention at the 16-freq level
    xa = jnp.asarray(rng.standard_normal((B, 16, 20, 256)), dt)
    from diffsep_tpu.models.layers import AttnBlockpp
    attn = AttnBlockpp(skip_rescale=True)
    ap = jax.jit(attn.init)(jax.random.PRNGKey(0), xa)
    timeit("attention 16x20x256",
           jax.jit(lambda p, x: attn.apply(p, x)), ap, xa)

    print(f"total resample time: {tot_resamp:.2f} ms of {total:.2f} ms fwd")


if __name__ == "__main__":
    main()
