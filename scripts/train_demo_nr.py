#!/usr/bin/env python
"""End-to-end learning demo for the ENHANCEMENT recipe (model=nr).

Trains a small NCSN++ score model with the noise-reduction configuration —
PriorMixSDE (mixture-power-modulated diffusion), init_hack=4, enhancement
cast as 2-"source" separation with target = stack[clean, noisy-clean]
(reference config/model/nr.yaml + datasets/vctk_demand.py) — on synthetic
noisy speech-like signals, then enhances held-out clips and reports
SI-SDR of the clean estimate and native PESQ-wb against the unprocessed
noisy floor. Complements scripts/train_demo.py (separation recipe): this
validates the PriorMixSDE envelope math + init_hack 4 + the nr recipe's
val metrics under real gradient descent.

Run (TPU or CPU):  python scripts/train_demo_nr.py [steps]
Writes /tmp/train_demo_nr_result.json and prints a summary line.
"""
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

FS = 16000
N_SAMPLES = 16000  # 1 s


def make_batch(rng, b, n, fs=FS):
    """'Speech': harmonic tone stack with a slow on/off envelope and random
    pitch; 'noise': pink-ish broadband noise at ~0 dB input SNR segments."""
    t = np.arange(n) / fs
    clean = np.zeros((b, n))
    for i in range(b):
        f0 = rng.uniform(90, 250)
        env = np.clip(np.sin(2 * np.pi * rng.uniform(1.5, 4.0) * t + rng.uniform(0, 6.3)), 0, None)
        sig = sum(
            rng.uniform(0.4, 1.0) / (k + 1) * np.sin(2 * np.pi * f0 * (k + 1) * t + rng.uniform(0, 6.3))
            for k in range(6)
        )
        clean[i] = env * sig
    clean /= np.maximum(np.std(clean, axis=-1, keepdims=True), 1e-8)
    clean *= 0.1
    # pink-ish noise: cumulative-sum-filtered white noise, power matched
    w = rng.standard_normal((b, n))
    pink = np.cumsum(w, axis=-1)
    pink -= np.mean(pink, axis=-1, keepdims=True)
    pink /= np.maximum(np.std(pink, axis=-1, keepdims=True), 1e-8)
    noise = (0.5 * pink + 0.5 * w / np.std(w, axis=-1, keepdims=True)) * 0.05
    noisy = clean + noise
    # enhancement-as-separation contract (vctk_demand.py): mix = noisy,
    # target channels = [clean, noisy - clean]
    tgt = np.stack([clean, noisy - clean], axis=1).astype(np.float32)
    mix = noisy[:, None, :].astype(np.float32)
    return mix, tgt


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    from diffsep_tpu.config import compose
    from diffsep_tpu.model import DiffSepModel
    from diffsep_tpu.models.losses import PESQ, SISDRLoss

    cfg = compose(
        [
            "model=nr",
            "model.score_model.backbone_args.nf=32",
            "model.score_model.backbone_args.ch_mult=[1,1,2]",
            "model.score_model.backbone_args.num_res_blocks=1",
            "model.score_model.backbone_args.attn_resolutions=[64]",
            "model.score_model.backbone_args.dtype=bfloat16",
            "model.optimizer.lr=0.001",
            "trainer.accumulate_grad_batches=1",
        ]
    )
    model = DiffSepModel(cfg)

    rng = np.random.default_rng(0)
    b = 16
    mix, tgt = make_batch(rng, b, N_SAMPLES)
    mix_j, tgt_j = jnp.asarray(mix), jnp.asarray(tgt)

    def sync(x):
        return np.asarray(jax.device_get(x))

    state = model.init_state(jax.random.PRNGKey(0), mix_j, tgt_j)
    sync(state.step)
    step_fn = jax.jit(model.make_train_step(jax.random.PRNGKey(1)), donate_argnums=(0,))

    t0 = time.perf_counter()
    loss0 = None
    for i in range(steps):
        mix_np, tgt_np = make_batch(rng, b, N_SAMPLES)
        state, metrics = step_fn(state, jnp.asarray(mix_np), jnp.asarray(tgt_np))
        if i == 0:
            loss0 = float(sync(metrics["train/score_loss"]))
        if (i + 1) % 100 == 0:
            print(
                f"step {i + 1}: loss {float(sync(metrics['train/score_loss'])):.4f}",
                flush=True,
            )
    loss_final = float(sync(metrics["train/score_loss"]))
    train_time = time.perf_counter() - t0

    # held-out enhancement: channel 0 of the PC estimate is the clean source
    mix_te, tgt_te = make_batch(np.random.default_rng(123), 8, N_SAMPLES)
    clean_te = tgt_te[:, :1]
    si_sdr = SISDRLoss(zero_mean=True, clamp_db=30, reduction="mean", sign_flip=True)
    pesq_wb = PESQ(mode="wb", fs=FS, max_items=8)

    est, nfe = model.separate(
        state.ema.params, jax.random.PRNGKey(7), jnp.asarray(mix_te), N=30
    )
    est_clean = np.asarray(sync(est))[:, :1]

    si_est = float(si_sdr(jnp.asarray(est_clean), jnp.asarray(clean_te)))
    si_floor = float(si_sdr(jnp.asarray(mix_te), jnp.asarray(clean_te)))
    pesq_est = float(pesq_wb(est_clean, clean_te))
    pesq_floor = float(pesq_wb(mix_te, clean_te))

    result = {
        "steps": steps,
        "train_time_s": round(train_time, 1),
        "loss_first": round(loss0, 4),
        "loss_final": round(loss_final, 4),
        "si_sdr_noisy_floor_db": round(si_floor, 2),
        "si_sdr_enhanced_db": round(si_est, 2),
        "improvement_db": round(si_est - si_floor, 2),
        "pesq_wb_noisy_floor": round(pesq_floor, 3),
        "pesq_wb_enhanced": round(pesq_est, 3),
    }
    print(json.dumps(result), flush=True)
    with open("/tmp/train_demo_nr_result.json", "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
