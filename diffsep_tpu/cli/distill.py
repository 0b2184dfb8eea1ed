"""Progressive-distillation entry point — beyond-reference capability.

Distills a trained DiffSep run into low-NFE DDIM students (train/distill.py,
Salimans & Ho 2022 halving schedule re-derived for the mixing-SDE family):

    python -m diffsep_tpu.cli.distill exp/sep/2026-.../ \
        --stages 8,4,2 --steps 5000 --out exp/sep-distilled

Each stage writes a self-contained run directory ``<out>/N<n>/`` (hparams +
orbax checkpoint) whose config pins the serving sampler to
``ddim/none/N=n`` — so every existing tool (evaluate, evaluate_mp,
separate, serve) loads and runs a distilled student with no flags, and the
-N/--pred knobs still override. The teacher can be any checkpoint flavor
cli/loading.py accepts, including reference .ckpt files.
"""
from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

log = logging.getLogger(__name__)

from ..compilation_cache import enable as _enable_cache

_enable_cache()


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("ckpt", type=Path,
                    help="teacher: run dir, orbax step dir, or torch .ckpt")
    ap.add_argument("--stages", default="8,4,2",
                    help="comma-separated halving schedule of serving Ns")
    ap.add_argument("--steps", type=int, default=5000,
                    help="optimizer steps per stage")
    ap.add_argument("--teacher-substeps", type=int, default=2)
    ap.add_argument("--on-policy-frac", type=float, default=0.0,
                    help="fraction of distill inputs drawn from the "
                         "student's own sampler trajectory (serving-time "
                         "distribution; costs N-1 extra evals/step)")
    ap.add_argument("--schedule", default=None,
                    choices=[None, "linear", "log", "revlog"],
                    help="time grid (pc_sample semantics); students are "
                         "distilled AND served on this grid")
    ap.add_argument("--lr", type=float, default=None,
                    help="override the run's learning rate for distillation")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=Path, default=None,
                    help="output root (default: <ckpt>/distilled)")
    ap.add_argument("--log-every", type=int, default=100)
    args = ap.parse_args(argv)

    import jax
    import yaml

    from ..config.compose import to_dict
    from ..data.datamodule import Valentini_Module, WSJ0_mix_Module
    from ..model import DiffSepModel
    from ..train.checkpoints import CheckpointManager
    from ..train.distill import (
        DistillConfig,
        init_student_state,
        make_distill_step,
    )
    from ..train.loop import batch_multiple, pad_batch_for_tpu
    from .loading import load_model

    stages = tuple(int(s) for s in str(args.stages).split(","))
    model, teacher_params = load_model(args.ckpt)
    cfg = model.config
    if args.lr is not None:
        cfg.model.optimizer.lr = float(args.lr)
        model = DiffSepModel(cfg)  # rebuild so the optimizer sees the lr

    out_root = args.out or (
        (args.ckpt if args.ckpt.is_dir() else args.ckpt.parent) / "distilled"
    )
    out_root.mkdir(parents=True, exist_ok=True)

    pad_mult = int(cfg.model.fs)
    if cfg.name == "enhancement":
        dm = Valentini_Module(cfg, pad_to_multiple=pad_mult)
    else:
        dm = WSJ0_mix_Module(cfg, pad_to_multiple=pad_mult)
    loader = dm.train_dataloader()
    bmult = batch_multiple()

    def batches():
        """Cycle the train loader forever; pad to TPU-friendly batch
        multiples (filler rows repeat real samples — benign for the
        distillation regression, unlike a loss that must not re-weight).
        Loader output stays HOST numpy all the way into the jitted step
        (pad_batch_for_tpu is a host op; a jnp.asarray here would add a
        device->host->device round trip per step, train/loop.py:361)."""
        while True:
            for mix, tgt in loader:
                mix, tgt, _ = pad_batch_for_tpu(mix, tgt, bmult)
                yield mix, tgt

    batch_iter = batches()
    base_key = jax.random.PRNGKey(args.seed)
    teacher = teacher_params
    for si, n in enumerate(stages):
        dcfg = DistillConfig(
            n_student=int(n),
            t_eps=model.t_eps,
            schedule=args.schedule,
            teacher_substeps=args.teacher_substeps,
            source_order=model.loss_cfg.train_source_order,
            on_policy_frac=args.on_policy_frac,
        )
        step_fn = jax.jit(
            make_distill_step(
                model.score_apply, model.sde, model.tx, model.clipper,
                model.optim_cfg, jax.random.fold_in(base_key, si), dcfg,
            ),
            donate_argnums=(0,),
        )
        state = init_student_state(teacher, model.tx, model.clipper)
        log.info("stage N=%d: %d steps", n, args.steps)
        for step in range(args.steps):
            mix, tgt = next(batch_iter)
            state, metrics = step_fn(state, teacher, mix, tgt)
            if args.log_every and (step + 1) % args.log_every == 0:
                log.info(
                    "[N=%d] step %d: loss %.5f", n, step + 1,
                    float(jax.device_get(metrics["distill/loss"])),
                )

        # self-contained student run dir: sampler pinned to its serving N
        stage_dir = out_root / f"N{n}"
        stage_dir.mkdir(parents=True, exist_ok=True)
        stage_cfg = to_dict(cfg)
        stage_cfg["model"]["sampler"] = {
            "predictor_name": "ddim", "corrector_name": "none", "N": int(n),
        }
        if args.schedule:
            stage_cfg["model"]["sampler"]["schedule"] = args.schedule
        with open(stage_dir / "hparams.yaml", "w") as f:
            yaml.safe_dump({"config": stage_cfg}, f)
        ckpt_mgr = CheckpointManager(
            stage_dir / "checkpoints", best_symlink=False
        )
        ckpt_mgr.save(int(jax.device_get(state.step)), state)
        ckpt_mgr.close()
        log.info("stage N=%d saved to %s", n, stage_dir)
        teacher = state.ema.params

    print(str(out_root))
    return 0


if __name__ == "__main__":
    sys.exit(main())
