#!/usr/bin/env python
"""End-to-end learning demo on synthetic separable mixtures.

Trains a small NCSN++ score model on mixtures of two spectrally-disjoint
sources (low-band vs high-band filtered noise), then separates held-out
mixtures with the PC sampler and reports SI-SDR against the unprocessed
mixture floor. A working system must clearly beat the floor — this
validates the whole loop (loss -> optimizer -> EMA -> sampler) with real
gradient descent, not just shape checks.

Run (TPU or CPU):  python scripts/train_demo.py [steps] [--dtype bfloat16]
                       [--remat] [--out /tmp/train_demo_result.json]
Writes the result JSON and prints a summary line. The --dtype/--remat
knobs drive the bf16-vs-f32 convergence comparison that decides the
training recipe default (see docs/BF16_AB.md).
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from diffsep_tpu.compilation_cache import enable as _enable_cache

_enable_cache()


def make_batch(rng, b, n, fs=8000):
    """Source 1: low-band noise; source 2: high-band noise."""
    from scipy.signal import butter, lfilter

    lo_b, lo_a = butter(4, 500 / (fs / 2), "low")
    hi_b, hi_a = butter(4, 1500 / (fs / 2), "high")
    s1 = lfilter(lo_b, lo_a, rng.standard_normal((b, n)), axis=-1)
    s2 = lfilter(hi_b, hi_a, rng.standard_normal((b, n)), axis=-1)
    # distinct powers make the (non-PIT) power-ordered target well defined
    s1 = s1 / np.std(s1, axis=-1, keepdims=True) * 0.13
    s2 = s2 / np.std(s2, axis=-1, keepdims=True) * 0.07
    tgt = np.stack([s1, s2], axis=1).astype(np.float32)
    return tgt.sum(axis=1, keepdims=True), tgt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("steps", nargs="?", type=int, default=2000)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--out", default="/tmp/train_demo_result.json")
    ap.add_argument(
        "--seed", type=int, default=0,
        help="training seed: drives the train-data stream, the param init "
        "AND the per-step diffusion noise (seed=0 reproduces the original "
        "pinned run); the held-out eval set and eval sampler key stay "
        "FIXED across seeds so the spread of the reported metrics "
        "measures training variance on a common test protocol "
        "(scripts/seed_spread.py aggregates)",
    )
    ap.add_argument(
        "--save-ckpt", default=None,
        help="msgpack path: save the trained EMA params + a provenance "
        "sidecar in the format scripts/distill_demo.py --teacher-ckpt "
        "expects, so per-seed distillation reuses this run's teacher",
    )
    args = ap.parse_args()
    steps = args.steps
    from diffsep_tpu.config import compose
    from diffsep_tpu.model import DiffSepModel
    from diffsep_tpu.models.losses import SISDRLoss

    cfg = compose(
        [
            "model.score_model.backbone_args.nf=32",
            "model.score_model.backbone_args.ch_mult=[1,1,2]",
            "model.score_model.backbone_args.num_res_blocks=1",
            "model.score_model.backbone_args.attn_resolutions=[64]",
            f"model.score_model.backbone_args.dtype={args.dtype}",
            f"model.score_model.backbone_args.remat={str(args.remat).lower()}",
            "model.train_source_order=power",
            "model.optimizer.lr=0.001",
            "trainer.accumulate_grad_batches=1",
        ]
    )
    model = DiffSepModel(cfg)

    # seed=0 keeps the exact (0, PRNGKey(0), PRNGKey(1)) triple of the
    # original pinned runs; other seeds shift data + init + train noise
    rng = np.random.default_rng(args.seed)
    fs, n, b = 8000, 8000, 16
    mix, tgt = make_batch(rng, b, n, fs)
    mix_j, tgt_j = jnp.asarray(mix), jnp.asarray(tgt)

    def sync(x):
        return np.asarray(jax.device_get(x))

    state = model.init_state(jax.random.PRNGKey(args.seed), mix_j, tgt_j)
    sync(state.step)
    step_fn = jax.jit(
        model.make_train_step(jax.random.PRNGKey(1000 * args.seed + 1)),
        donate_argnums=(0,),
    )

    t0 = time.perf_counter()
    loss0 = None
    curve = []
    for i in range(steps):
        mix_np, tgt_np = make_batch(rng, b, n, fs)
        state, metrics = step_fn(state, jnp.asarray(mix_np), jnp.asarray(tgt_np))
        if i == 0:
            loss0 = float(sync(metrics["train/score_loss"]))
        if (i + 1) % 100 == 0:
            l = float(sync(metrics["train/score_loss"]))
            curve.append(round(l, 4))
            print(f"step {i + 1}: loss {l:.4f}", flush=True)
    loss_final = float(sync(metrics["train/score_loss"]))
    train_time = time.perf_counter() - t0

    # held-out evaluation: production PC sampler and the fast DDIM sampler
    mix_te, tgt_te = make_batch(np.random.default_rng(123), 8, n, fs)
    metric = SISDRLoss(zero_mean=True, clamp_db=30, reduction="mean", sign_flip=True)

    est, nfe = model.separate(
        state.ema.params, jax.random.PRNGKey(7), jnp.asarray(mix_te), N=30
    )
    si_sdr_est = float(metric(jnp.asarray(sync(est)), jnp.asarray(tgt_te)))

    est_fast, _ = model.separate(
        state.ema.params, jax.random.PRNGKey(7), jnp.asarray(mix_te),
        predictor_name="ddim", corrector_name="none", N=6,
    )
    si_sdr_fast = float(metric(jnp.asarray(sync(est_fast)), jnp.asarray(tgt_te)))

    # low-NFE sampler sweep: first-order exact-transition (ddim) vs the
    # second-order multistep (dpmpp) at the same NN-eval budgets — the
    # learned-score counterpart of tests/test_sampling.py's analytic check
    sweep = {}
    for pred in ("ddim", "dpmpp"):
        for n_steps in (4, 6, 8):
            est_s, _ = model.separate(
                state.ema.params, jax.random.PRNGKey(7), jnp.asarray(mix_te),
                predictor_name=pred, corrector_name="none", N=n_steps,
            )
            sweep[f"si_sdr_{pred}_n{n_steps}_db"] = round(
                float(metric(jnp.asarray(sync(est_s)), jnp.asarray(tgt_te))), 2
            )

    floor = float(
        metric(jnp.broadcast_to(jnp.asarray(mix_te), tgt_te.shape), jnp.asarray(tgt_te))
    )
    result = {
        "steps": steps,
        "seed": args.seed,
        "dtype": args.dtype,
        "remat": bool(args.remat),
        "loss_curve_every100": curve,
        "train_time_s": round(train_time, 1),
        "loss_first": round(loss0, 4),
        "loss_final": round(loss_final, 4),
        "si_sdr_mixture_floor_db": round(floor, 2),
        "si_sdr_separated_db": round(si_sdr_est, 2),
        "si_sdr_ddim_n6_db": round(si_sdr_fast, 2),
        "improvement_db": round(si_sdr_est - floor, 2),
        **sweep,
    }
    print(json.dumps(result), flush=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)

    if args.save_ckpt:
        from flax import serialization

        ckpt = Path(args.save_ckpt)
        ckpt.write_bytes(
            serialization.to_bytes(jax.device_get(state.ema.params))
        )
        # provenance sidecar in distill_demo.py --teacher-ckpt's format
        ckpt.with_suffix(".json").write_text(json.dumps({
            "teacher_steps": steps,
            "teacher_train_time_s": round(train_time, 1),
            "seed": args.seed,
        }))
        print(f"teacher saved to {ckpt}", flush=True)


if __name__ == "__main__":
    main()
