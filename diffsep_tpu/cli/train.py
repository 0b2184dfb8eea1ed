"""Training entry point.

Capability parity with the reference's train.py: hydra-style CLI
(`python -m diffsep_tpu.cli.train experiment=icassp-separation
model.sde.sigma_min=0.1`), run-dir templating
exp/<name>/<timestamp>_<overrides>/ (config/config.yaml:20-29), seed
setting, datamodule choice by experiment name (train.py:122-125),
checkpoint/resume, optional test after fit.
"""
from __future__ import annotations

import datetime
import logging
import sys
from pathlib import Path

from ..config import compose

log = logging.getLogger(__name__)

from ..compilation_cache import enable as _enable_cache

_enable_cache()


def make_run_dir(cfg, overrides) -> Path:
    now = datetime.datetime.now().timestamp()
    import jax

    if jax.process_count() > 1:
        # every rank computes its own wall clock; a run launched across a
        # second boundary would otherwise split ranks into different run
        # dirs — and train/loop.py requires every rank to drive orbax on
        # the SAME checkpoint directory. Rank 0's timestamp wins.
        import numpy as _np
        from jax.experimental import multihost_utils

        now = float(
            multihost_utils.broadcast_one_to_all(_np.float64(now))
        )
    ts = datetime.datetime.fromtimestamp(now).strftime("%Y-%m-%d_%H-%M-%S")
    tag = "_".join(
        o.replace("/", ".")
        for o in overrides
        if "=" in o and not o.startswith("path.")
    )
    # glob metacharacters ([, ], *, ?) in the path break orbax's OCDBT
    # per-process merge — strip them from override-derived names
    tag = "".join(c for c in tag if c not in "[]*?,' \"")
    if len(tag) > 120:  # keep run-dir names filesystem-safe
        import hashlib

        tag = tag[:100] + "-" + hashlib.sha1(tag.encode()).hexdigest()[:8]
    d = Path(cfg.path.exp_root) / str(cfg.name) / (f"{ts}_{tag}" if tag else ts)
    d.mkdir(parents=True, exist_ok=True)
    return d


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = compose(overrides)

    # multi-host TPU pods: bring up the JAX process group (no-op on a
    # single host) — the NCCL/DDP equivalent (SURVEY.md §2.8)
    from ..utils.distributed import initialize_distributed

    initialize_distributed()

    from ..data.datamodule import Valentini_Module, WSJ0_mix_Module
    from ..model import DiffSepModel
    from ..train.loop import fit

    run_dir = make_run_dir(cfg, overrides)
    log.info("run dir: %s", run_dir)

    # bucket batch lengths to 1 s so the jitted train step compiles a
    # handful of shapes (short files make pad-to-longest batches vary)
    pad_mult = int(cfg.model.fs)
    if cfg.name == "enhancement":
        dm = Valentini_Module(cfg, pad_to_multiple=pad_mult)
    else:
        dm = WSJ0_mix_Module(cfg, pad_to_multiple=pad_mult)

    # warm start from another run's checkpoint (reference train.py:25-83
    # load_pretrained, realized intent: merge the pretrained run's
    # score_model architecture into this run's config so the weights fit,
    # then start training from those weights with a fresh optimizer).
    # The reference's own implementation cannot run: both branches mutate
    # `config.model.seld_model` (train.py:53,68) — a leftover from another
    # project that DiffSep's config never defines (pinned by execution in
    # tests/test_load_pretrained.py) — and the calibration branch opens
    # hparams_path (parents[1]) after checking hparams_path_alt
    # (parents[0]) exists (train.py:47-50).
    pretrained_params = pretrained_ema = None
    lp = cfg.get("load_pretrained")
    if lp:
        from ..config.compose import ConfigNode
        from .loading import load_pretrained_weights

        log.info("load pretrained: %s", lp)
        pre_model, pretrained_params, pretrained_ema = (
            load_pretrained_weights(Path(lp))
        )
        cfg.model.score_model = ConfigNode.wrap(
            dict(pre_model.config.model["score_model"])
        )

    model = DiffSepModel(cfg)

    state = None
    if cfg.get("train", True):
        state = fit(
            model,
            dm,
            run_dir,
            seed=int(cfg.get("seed", 0)),
            # reference accepts the key both at top level (train.py:140) and
            # under trainer (config/trainer/default.yaml:11)
            resume=(
                cfg.get("trainer", {}).get("resume_from_checkpoint")
                or cfg.get("resume_from_checkpoint")
                or False
            ),
            init_params=pretrained_params,
            init_ema_params=pretrained_ema,
        )

    from ..train import loop as train_loop

    if train_loop.LAST_FIT_PREEMPTED:
        # preemption checkpoint is saved; the SIGTERM grace window does not
        # have minutes for the test-split inference — exit cleanly NOW and
        # resume with trainer.resume_from_checkpoint=latest
        log.warning("preempted: skipping post-train test evaluation")
        return state

    if cfg.get("test", False):
        from ..cli.evaluate import evaluate_datamodule

        if state is None:
            # train=false test=true: the reference falls back to "test with
            # current model value" when no best checkpoint exists
            # (train.py:150-155) — evaluate under freshly initialized
            # weights instead of crashing on params=None
            import types as _types

            import jax
            import jax.numpy as jnp

            log.warning(
                "test=true with train=false: no trained state — evaluating "
                "freshly initialized weights (reference train.py:150-155)"
            )
            n = int(cfg.model.fs)
            n_src = int(cfg.model.n_speakers)
            params = model.init_params(
                jax.random.PRNGKey(int(cfg.get("seed", 0))),
                jnp.zeros((1, 1, n), jnp.float32),
                jnp.zeros((1, n_src, n), jnp.float32),
            )
            state = _types.SimpleNamespace(
                ema=_types.SimpleNamespace(params=params)
            )

        # multi-process: evaluate_datamodule shards the split per process
        # and merges on rank 0 — rank-GATING here would create minutes of
        # exit skew and trip the coordination-service shutdown barrier
        evaluate_datamodule(model, state, dm, run_dir / "test_results")
    return state


if __name__ == "__main__":
    main()
