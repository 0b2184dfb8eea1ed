#!/usr/bin/env python
"""Progressive-distillation demo on synthetic separable mixtures (TPU).

Trains the same small NCSN++ teacher as scripts/train_demo.py, then runs
the halving schedule (train/distill.py) and reports held-out SI-SDR of
each distilled student at its serving N — against the teacher's own ddim
and the PC-N=30 reference point. This is the learned-model validation of
the distillation math (tests/test_distill.py proves the fixed-point and
grid identities; this proves a REAL student closes the low-NFE quality
gap the round-3 sweep measured: teacher ddim N=4 loses ~11 dB vs PC-30
on this task).

Run:  python scripts/distill_demo.py [teacher_steps] [--distill-steps K]
          [--stages 8,4,2,1] [--out scripts/distill_demo_result.json]
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
from train_demo import make_batch

_enable_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("teacher_steps", nargs="?", type=int, default=3000)
    ap.add_argument("--distill-steps", type=int, default=1500)
    ap.add_argument("--stages", default="8,4,2,1")
    ap.add_argument("--schedule", default=None,
                    choices=[None, "linear", "log", "revlog"])
    ap.add_argument("--on-policy-frac", type=float, default=0.0)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument(
        "--stage-cache-dir", default=None,
        help="resumable distillation: each finished stage's EMA params are "
        "cached here and a rerun skips them (pass a dir that encodes "
        "teacher/seed/schedule/steps — stale files are loaded blindly); "
        "bounds what an axon-tunnel wedge + watchdog relaunch loses",
    )
    ap.add_argument(
        "--teacher-ckpt", default=None,
        help="msgpack path: load the teacher from it if it exists, else "
        "train and save — lets grid/on-policy variants share one teacher",
    )
    ap.add_argument(
        "--out", default=str(Path(__file__).parent / "distill_demo_result.json")
    )
    ap.add_argument(
        "--seed", type=int, default=0,
        help="drives teacher data/init/noise AND the distillation data "
        "stream + distill noise keys (seed=0 reproduces the original "
        "pinned run); the held-out eval set/key stay fixed across seeds "
        "(scripts/seed_spread.py aggregates the spread)",
    )
    args = ap.parse_args()
    stages = tuple(int(s) for s in args.stages.split(","))

    from diffsep_tpu.config import compose
    from diffsep_tpu.model import DiffSepModel
    from diffsep_tpu.models.losses import SISDRLoss
    from diffsep_tpu.train.distill import progressive_distill

    cfg = compose(
        [
            "model.score_model.backbone_args.nf=32",
            "model.score_model.backbone_args.ch_mult=[1,1,2]",
            "model.score_model.backbone_args.num_res_blocks=1",
            "model.score_model.backbone_args.attn_resolutions=[64]",
            "model.score_model.backbone_args.dtype=bfloat16",
            "model.score_model.backbone_args.remat=false",
            "model.train_source_order=power",
            "model.optimizer.lr=0.001",
            "trainer.accumulate_grad_batches=1",
        ]
    )
    model = DiffSepModel(cfg)

    rng = np.random.default_rng(args.seed)
    fs, n, b = 8000, 8000, args.batch
    mix, tgt = make_batch(rng, b, n, fs)
    mix_j, tgt_j = jnp.asarray(mix), jnp.asarray(tgt)

    def sync(x):
        return np.asarray(jax.device_get(x))

    # --- teacher: identical recipe to train_demo.py ---
    from flax import serialization

    ckpt = Path(args.teacher_ckpt) if args.teacher_ckpt else None
    if ckpt is not None and ckpt.exists():
        # the msgpack alone carries no provenance — refuse a cache whose
        # recorded recipe doesn't match, so the result JSON can't mislabel
        # a stale teacher (e.g. a 10k cache re-used under teacher_steps=3000)
        meta = json.loads(ckpt.with_suffix(".json").read_text())
        if meta["teacher_steps"] != args.teacher_steps:
            raise SystemExit(
                f"{ckpt} holds a {meta['teacher_steps']}-step teacher but "
                f"the teacher_steps argument is {args.teacher_steps}; "
                "delete the cache or pass the matching step count as the "
                "positional teacher_steps argument"
            )
        if meta.get("seed", 0) != args.seed:
            raise SystemExit(
                f"{ckpt} holds a seed={meta.get('seed', 0)} teacher but "
                f"--seed is {args.seed}; delete the cache or match the seed"
            )
        template = model.init_state(jax.random.PRNGKey(0), mix_j, tgt_j)
        teacher = serialization.from_bytes(
            jax.device_get(template.ema.params), ckpt.read_bytes()
        )
        teacher = jax.device_put(teacher)
        teacher_time = float(meta.get("teacher_train_time_s", 0.0))
        print(f"teacher loaded from {ckpt} ({meta})", flush=True)
    else:
        # same (seed, PRNGKey(seed), PRNGKey(1000*seed+1)) scheme as
        # scripts/train_demo.py --seed, so cached teachers interchange
        state = model.init_state(jax.random.PRNGKey(args.seed), mix_j, tgt_j)
        sync(state.step)
        step_fn = jax.jit(
            model.make_train_step(jax.random.PRNGKey(1000 * args.seed + 1)),
            donate_argnums=(0,),
        )
        t0 = time.perf_counter()
        for i in range(args.teacher_steps):
            mix_np, tgt_np = make_batch(rng, b, n, fs)
            state, metrics = step_fn(
                state, jnp.asarray(mix_np), jnp.asarray(tgt_np)
            )
            if (i + 1) % 500 == 0:
                l = float(sync(metrics["train/score_loss"]))
                print(f"teacher step {i + 1}: loss {l:.4f}", flush=True)
        teacher_time = time.perf_counter() - t0
        teacher = state.ema.params
        if ckpt is not None:
            ckpt.write_bytes(
                serialization.to_bytes(jax.device_get(teacher))
            )
            ckpt.with_suffix(".json").write_text(json.dumps({
                "teacher_steps": args.teacher_steps,
                "teacher_train_time_s": round(teacher_time, 1),
                "seed": args.seed,
            }))
            print(f"teacher saved to {ckpt}", flush=True)

    mix_te, tgt_te = make_batch(np.random.default_rng(123), 8, n, fs)
    mix_te_j, tgt_te_j = jnp.asarray(mix_te), jnp.asarray(tgt_te)
    metric = SISDRLoss(
        zero_mean=True, clamp_db=30, reduction="mean", sign_flip=True
    )

    def eval_si_sdr(params, **kw):
        est, _ = model.separate(params, jax.random.PRNGKey(7), mix_te_j, **kw)
        return round(float(metric(jnp.asarray(sync(est)), tgt_te_j)), 2)

    result = {
        "teacher_steps": args.teacher_steps,
        "seed": args.seed,
        "teacher_train_time_s": round(teacher_time, 1),
        "distill_steps_per_stage": args.distill_steps,
        "stages": list(stages),
        "schedule": args.schedule,
        "on_policy_frac": args.on_policy_frac,
        "si_sdr_teacher_pc_n30_db": eval_si_sdr(teacher, N=30),
    }
    for n_steps in sorted(set(stages)):
        result[f"si_sdr_teacher_ddim_n{n_steps}_db"] = eval_si_sdr(
            teacher, predictor_name="ddim", corrector_name="none",
            N=n_steps, schedule=args.schedule,
        )
    print(json.dumps(result), flush=True)

    # --- progressive distillation ---
    drng = np.random.default_rng(777 + args.seed)

    def batch_fn(step):
        m, t = make_batch(drng, b, n, fs)
        return jnp.asarray(m), jnp.asarray(t)

    t0 = time.perf_counter()
    students = progressive_distill(
        model,
        teacher,
        batch_fn,
        stages=stages,
        steps_per_stage=args.distill_steps,
        base_key=jax.random.PRNGKey(42 + args.seed),
        log_every=250,
        schedule=args.schedule,
        on_policy_frac=args.on_policy_frac,
        stage_cache_dir=args.stage_cache_dir,
    )
    result["distill_time_s"] = round(time.perf_counter() - t0, 1)

    for n_steps, params in students.items():
        result[f"si_sdr_student_ddim_n{n_steps}_db"] = eval_si_sdr(
            params, predictor_name="ddim", corrector_name="none",
            N=n_steps, schedule=args.schedule,
        )
        print(
            f"stage N={n_steps}: student "
            f"{result[f'si_sdr_student_ddim_n{n_steps}_db']} dB vs teacher "
            f"{result[f'si_sdr_teacher_ddim_n{n_steps}_db']} dB",
            flush=True,
        )

    print(json.dumps(result), flush=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
