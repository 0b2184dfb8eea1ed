#!/usr/bin/env python
"""Progressive-distillation demo for the ENHANCEMENT recipe (model=nr) —
VERDICT r4 item 6: the distillation algebra covers PriorMixSDE (the
per-sample power envelope cancels in transport ratios; where it doesn't —
the plain-SNR loss weights — snr_channel_weights folds it in), and a
dp-sharded distill test exists, but until this record the measured
quality story was separation-only.

Trains the small nr teacher of scripts/train_demo_nr.py (PriorMixSDE,
init_hack=4, enhancement cast as 2-"source" separation with target =
stack[clean, noisy-clean], reference config/model/nr.yaml), runs the
halving schedule (train/distill.py) on the log grid, and reports held-out
SI-SDR of the clean estimate AND native PESQ-wb for the teacher (PC N=30
anchor + ddim at each serving N) vs the distilled students at N in the
stage set.

Run (TPU):  python scripts/distill_demo_nr.py [teacher_steps]
                [--distill-steps K] [--stages 4,2,1] [--schedule log]
                [--teacher-ckpt /tmp/nr_teacher.msgpack] [--seed 0]
Writes scripts/distill_demo_nr_result.json (bench.py embeds it).
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

from diffsep_tpu.compilation_cache import enable as _enable_cache
from train_demo_nr import FS, N_SAMPLES, make_batch

_enable_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("teacher_steps", nargs="?", type=int, default=2000)
    ap.add_argument("--distill-steps", type=int, default=1500)
    ap.add_argument("--stages", default="4,2,1")
    ap.add_argument("--schedule", default="log",
                    choices=["linear", "log", "revlog", "none"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--teacher-ckpt", default=None,
        help="msgpack path: load the nr teacher from it if it exists, else "
        "train and save (same provenance-sidecar contract as "
        "scripts/distill_demo.py)",
    )
    ap.add_argument(
        "--stage-cache-dir", default=None,
        help="resumable distillation: finished stages' EMA params cached "
        "here and skipped on rerun (key the dir by teacher/seed/schedule/"
        "steps); bounds what a tunnel wedge + relaunch loses",
    )
    ap.add_argument(
        "--out",
        default=str(Path(__file__).parent / "distill_demo_nr_result.json"),
    )
    args = ap.parse_args()
    stages = tuple(int(s) for s in args.stages.split(","))
    schedule = None if args.schedule == "none" else args.schedule

    from flax import serialization

    from diffsep_tpu.config import compose
    from diffsep_tpu.model import DiffSepModel
    from diffsep_tpu.models.losses import PESQ, SISDRLoss
    from diffsep_tpu.train.distill import progressive_distill

    # identical recipe to scripts/train_demo_nr.py
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

    rng = np.random.default_rng(args.seed)
    b = args.batch
    mix, tgt = make_batch(rng, b, N_SAMPLES)
    mix_j, tgt_j = jnp.asarray(mix), jnp.asarray(tgt)

    def sync(x):
        return np.asarray(jax.device_get(x))

    # --- teacher (train-or-load, scripts/distill_demo.py's contract) ---
    ckpt = Path(args.teacher_ckpt) if args.teacher_ckpt else None
    if ckpt is not None and ckpt.exists():
        meta = json.loads(ckpt.with_suffix(".json").read_text())
        if meta["teacher_steps"] != args.teacher_steps or (
            meta.get("seed", 0) != args.seed
        ):
            raise SystemExit(
                f"{ckpt} holds a {meta['teacher_steps']}-step seed="
                f"{meta.get('seed', 0)} teacher but the arguments say "
                f"{args.teacher_steps}/seed={args.seed}; delete the cache "
                "or match them"
            )
        template = model.init_state(jax.random.PRNGKey(0), mix_j, tgt_j)
        teacher = jax.device_put(serialization.from_bytes(
            jax.device_get(template.ema.params), ckpt.read_bytes()
        ))
        teacher_time = float(meta.get("teacher_train_time_s", 0.0))
        print(f"teacher loaded from {ckpt} ({meta})", flush=True)
    else:
        state = model.init_state(jax.random.PRNGKey(args.seed), mix_j, tgt_j)
        sync(state.step)
        step_fn = jax.jit(
            model.make_train_step(jax.random.PRNGKey(1000 * args.seed + 1)),
            donate_argnums=(0,),
        )
        t0 = time.perf_counter()
        for i in range(args.teacher_steps):
            mix_np, tgt_np = make_batch(rng, b, N_SAMPLES)
            state, metrics = step_fn(
                state, jnp.asarray(mix_np), jnp.asarray(tgt_np)
            )
            if (i + 1) % 500 == 0:
                l = float(sync(metrics["train/score_loss"]))
                print(f"teacher step {i + 1}: loss {l:.4f}", flush=True)
        teacher_time = time.perf_counter() - t0
        teacher = state.ema.params
        if ckpt is not None:
            ckpt.write_bytes(serialization.to_bytes(jax.device_get(teacher)))
            ckpt.with_suffix(".json").write_text(json.dumps({
                "teacher_steps": args.teacher_steps,
                "teacher_train_time_s": round(teacher_time, 1),
                "seed": args.seed,
            }))
            print(f"teacher saved to {ckpt}", flush=True)

    # --- held-out eval: SI-SDR of the clean channel + native PESQ-wb ---
    mix_te, tgt_te = make_batch(np.random.default_rng(123), 8, N_SAMPLES)
    clean_te = tgt_te[:, :1]
    si_sdr = SISDRLoss(
        zero_mean=True, clamp_db=30, reduction="mean", sign_flip=True
    )
    pesq_wb = PESQ(mode="wb", fs=FS, max_items=8)

    def eval_metrics(params, **kw):
        est, _ = model.separate(
            params, jax.random.PRNGKey(7), jnp.asarray(mix_te), **kw
        )
        est_clean = sync(est)[:, :1]
        return (
            round(float(si_sdr(jnp.asarray(est_clean), jnp.asarray(clean_te))), 2),
            round(float(pesq_wb(est_clean, clean_te)), 3),
        )

    result = {
        "teacher_steps": args.teacher_steps,
        "seed": args.seed,
        "teacher_train_time_s": round(teacher_time, 1),
        "distill_steps_per_stage": args.distill_steps,
        "stages": list(stages),
        "schedule": schedule,
        "si_sdr_noisy_floor_db": round(
            float(si_sdr(jnp.asarray(mix_te), jnp.asarray(clean_te))), 2
        ),
        "pesq_wb_noisy_floor": round(float(pesq_wb(mix_te, clean_te)), 3),
    }
    si, pq = eval_metrics(teacher, N=30)
    result["si_sdr_teacher_pc_n30_db"] = si
    result["pesq_wb_teacher_pc_n30"] = pq
    for n_steps in sorted(set(stages)):
        si, pq = eval_metrics(
            teacher, predictor_name="ddim", corrector_name="none",
            N=n_steps, schedule=schedule,
        )
        result[f"si_sdr_teacher_ddim_n{n_steps}_db"] = si
        result[f"pesq_wb_teacher_ddim_n{n_steps}"] = pq
    print(json.dumps(result), flush=True)

    # --- progressive distillation ---
    # the per-step host synthesis (harmonic stacks over 16k samples) is a
    # meaningful fraction of a small-model step, so the distill stream
    # cycles a pregenerated pool — fresh iid data per POOL, not per step,
    # which at demo scale is indistinguishable (the pool is > 6x the
    # model's effective dataset memory at these step counts)
    drng = np.random.default_rng(777 + args.seed)
    pool = [make_batch(drng, b, N_SAMPLES) for _ in range(96)]
    pool = [(jnp.asarray(m), jnp.asarray(t)) for m, t in pool]

    def batch_fn(step):
        return pool[step % len(pool)]

    t0 = time.perf_counter()
    students = progressive_distill(
        model,
        teacher,
        batch_fn,
        stages=stages,
        steps_per_stage=args.distill_steps,
        base_key=jax.random.PRNGKey(42 + args.seed),
        log_every=250,
        schedule=schedule,
        stage_cache_dir=args.stage_cache_dir,
    )
    result["distill_time_s"] = round(time.perf_counter() - t0, 1)

    for n_steps, params in students.items():
        si, pq = eval_metrics(
            params, predictor_name="ddim", corrector_name="none",
            N=n_steps, schedule=schedule,
        )
        result[f"si_sdr_student_ddim_n{n_steps}_db"] = si
        result[f"pesq_wb_student_ddim_n{n_steps}"] = pq
        print(
            f"stage N={n_steps}: student {si} dB / PESQ {pq} vs teacher "
            f"{result[f'si_sdr_teacher_ddim_n{n_steps}_db']} dB / "
            f"{result[f'pesq_wb_teacher_ddim_n{n_steps}']}",
            flush=True,
        )

    print(json.dumps(result), flush=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
