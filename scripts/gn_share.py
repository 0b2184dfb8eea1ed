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
it is small, the kernel is not worth building (round-2 method: measure
before writing kernels).

NOTE on timing: on the axon remote-TPU platform `jax.block_until_ready`
returns before execution completes; every jitted function here returns a
SCALAR and timing forces `jax.device_get` per iteration (same rule as
bench.py).
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

import flax.linen as nn

import diffsep_tpu.models.layers as L

_OrigGroupNorm = L.GroupNorm


class _CheapGN(_OrigGroupNorm):
    """x*scale+bias — no statistics (upper bound for stats-fusion wins)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return (x * scale.astype(x.dtype) + bias.astype(x.dtype)).astype(x.dtype)


class _IdentGN(_OrigGroupNorm):
    """Identity (total GN cost incl. the apply pass)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        self.param("scale", nn.initializers.ones, (c,))
        self.param("bias", nn.initializers.zeros, (c,))
        return x


# converted-checkpoint param paths use the auto-name "GroupNorm_<k>"
_CheapGN.__name__ = "GroupNorm"
_IdentGN.__name__ = "GroupNorm"


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


def timeit(fn, args, iters=10):
    s = fn(*args)
    np.asarray(jax.device_get(s))  # compile + first run
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(jax.device_get(fn(*args)))
    return (time.perf_counter() - t0) / iters * 1e3


def run_variant(label, model, params, xt, t, mix):
    fwd = jax.jit(
        lambda p, x, tt, m: jnp.sum(model.score_apply(p, x, tt, m).astype(jnp.float32))
    )
    ms = timeit(fwd, (params, xt, t, mix))
    print(f"{label:8s}: {ms:8.2f} ms", flush=True)
    return ms


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    model, params, xt, t, mix = build(batch)

    ms_normal = run_variant("normal", model, params, xt, t, mix)

    L.GroupNorm = _CheapGN
    try:
        ms_cheap = run_variant("cheapgn", model, params, xt, t, mix)
    finally:
        L.GroupNorm = _OrigGroupNorm
    print(f"  stats budget: {ms_normal - ms_cheap:.2f} ms", flush=True)

    L.GroupNorm = _IdentGN
    try:
        ms_no = run_variant("nogn", model, params, xt, t, mix)
    finally:
        L.GroupNorm = _OrigGroupNorm
    print(f"  total GN cost: {ms_normal - ms_no:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
