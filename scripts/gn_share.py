#!/usr/bin/env python
"""Bound the GroupNorm share of the flagship forward at the bench shape.

Times the nf=128 NCSN++ forward (bf16, batch from argv, 5 s @ 8 kHz) three
ways:
  normal   — shipped GroupNorm (one-read stats + folded affine)
  cheapgn  — GroupNorm stats replaced by constants (pure x*a+b, 1R+1W):
             upper bound on what a perfect stats fusion could save
  nogn     — GroupNorm replaced by identity: total GN cost incl. the
             elementwise apply pass

The normal-vs-cheapgn delta is the budget for a Pallas stats kernel; if
it is small, the kernel is not worth building (ROADMAP round-2 method:
measure before writing kernels).
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

import diffsep_tpu.models.layers as L


def build(batch):
    from diffsep_tpu.config import compose
    from diffsep_tpu.model import DiffSepModel

    cfg = compose(
        [
            "experiment=icassp-separation",
            "model.score_model.backbone_args.dtype=bfloat16",
        ]
    )
    model = DiffSepModel(cfg)
    fs = 8000
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.standard_normal((batch, 1, 5 * fs)), jnp.float32) * 0.1
    tgt = jnp.zeros((batch, 2, 5 * fs), jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0), mix, tgt)
    xt = jnp.asarray(rng.standard_normal(tgt.shape), jnp.float32) * 0.1
    t = jnp.full((batch,), 0.5, jnp.float32)
    return model, params, xt, t, mix


def timeit(fn, args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    model, params, xt, t, mix = build(batch)

    fwd = jax.jit(lambda p, x, tt, m: model.score_apply(p, x, tt, m))
    ms_normal = timeit(fwd, (params, xt, t, mix))
    print(f"normal : {ms_normal:8.2f} ms  (batch {batch})", flush=True)

    orig = L.GroupNorm.__call__

    def cheap(self, x):
        c = x.shape[-1]
        scale = self.param("scale", jax.nn.initializers.ones, (c,))
        bias = self.param("bias", jax.nn.initializers.zeros, (c,))
        return (x * scale.astype(x.dtype) + bias.astype(x.dtype)).astype(x.dtype)

    L.GroupNorm.__call__ = cheap
    try:
        fwd2 = jax.jit(lambda p, x, tt, m: model.score_apply(p, x, tt, m))
        ms_cheap = timeit(fwd2, (params, xt, t, mix))
    finally:
        L.GroupNorm.__call__ = orig
    print(f"cheapgn: {ms_cheap:8.2f} ms  (stats budget {ms_normal - ms_cheap:.2f} ms)", flush=True)

    def ident(self, x):
        c = x.shape[-1]
        self.param("scale", jax.nn.initializers.ones, (c,))
        self.param("bias", jax.nn.initializers.zeros, (c,))
        return x

    L.GroupNorm.__call__ = ident
    try:
        fwd3 = jax.jit(lambda p, x, tt, m: model.score_apply(p, x, tt, m))
        ms_no = timeit(fwd3, (params, xt, t, mix))
    finally:
        L.GroupNorm.__call__ = orig
    print(f"nogn   : {ms_no:8.2f} ms  (total GN cost {ms_normal - ms_no:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
