#!/usr/bin/env python
"""Benchmark: WSJ0-2mix-style separation throughput at the reference
operating point (N=30 reverse steps, snr=0.5, corrector_steps=1 => 60
network evaluations per utterance, config/model/default.yaml:39-42).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value        = utterances/sec/chip for the flagship nf=128 NCSN++ +
               MixSDE PC sampler on 5 s 8 kHz utterances, batched.
vs_baseline  = speedup over a reference-architecture run on the SAME chip:
               the PyTorch reference dispatches each of the 60 network
               evaluations from host Python with batch size 1
               (evaluate.py:322-376, SURVEY.md §3.4); the baseline below
               reproduces that execution shape (per-step host loop,
               batch 1), while the TPU-native path runs the whole reverse
               process as one jit'd lax.scan over a batch.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp


def build():
    from diffsep_tpu.config import compose
    from diffsep_tpu.model import DiffSepModel

    cfg = compose(["experiment=icassp-separation"])
    model = DiffSepModel(cfg)
    fs = 8000
    n_samples = 5 * fs
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    mix = jnp.zeros((batch, 1, n_samples), jnp.float32)
    tgt = jnp.zeros((batch, 2, n_samples), jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0), mix, tgt)
    return model, params, mix


def bench_fused(model, params, mix, n_iter=3):
    """TPU-native: whole PC reverse process in one jit'd scan, batched."""

    @jax.jit
    def run(key):
        est, nfe = model.separate(params, key, mix)
        return est

    run(jax.random.PRNGKey(0)).block_until_ready()  # compile
    t0 = time.perf_counter()
    for i in range(n_iter):
        run(jax.random.PRNGKey(i)).block_until_ready()
    dt = (time.perf_counter() - t0) / n_iter
    return mix.shape[0] / dt


def bench_reference_style(model, params, mix, n_iter=1):
    """Reference execution shape: batch 1, each sampler step dispatched
    from host Python (the per-step kernel-launch pattern of SURVEY §3.4)."""
    from diffsep_tpu.sampling.correctors import AnnealedLangevinDynamics2
    from diffsep_tpu.sampling.predictors import ReverseDiffusionPredictor
    from diffsep_tpu.train.losses import normalize_batch

    sde = model.sde
    score_fn = lambda x, t, m: model.score_apply(params, x, t, m)
    pred = ReverseDiffusionPredictor(sde, score_fn)
    corr = AnnealedLangevinDynamics2(sde, score_fn, snr=0.5, n_steps=1)
    corr_up = jax.jit(corr.update)
    pred_up = jax.jit(pred.update)

    mix1 = mix[:1]

    def run(key):
        (mix_n, _), _, _ = normalize_batch(mix1, None)
        x = sde.prior_sampling(key, mix_n)
        ts = jnp.linspace(sde.T, 0.03, sde.N)
        for i in range(sde.N):
            t = jnp.full((1,), ts[i])
            k = jax.random.fold_in(key, i)
            kc, kp = jax.random.split(k)
            x, x_mean = corr_up(kc, x, t, mix_n)
            x, x_mean = pred_up(kp, x, t, mix_n)
        return x_mean.block_until_ready()

    run(jax.random.PRNGKey(0))  # compile
    t0 = time.perf_counter()
    for i in range(n_iter):
        run(jax.random.PRNGKey(i))
    dt = (time.perf_counter() - t0) / n_iter
    return 1.0 / dt


def main():
    model, params, mix = build()
    fused = bench_fused(model, params, mix)
    ref = bench_reference_style(model, params, mix)
    print(
        json.dumps(
            {
                "metric": "wsj0_2mix_separation_throughput_N30",
                "value": round(fused, 4),
                "unit": "utt/sec/chip (5s@8kHz, nf=128, 60 NN evals/utt)",
                "vs_baseline": round(fused / ref, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
