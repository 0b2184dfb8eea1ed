"""Model/checkpoint loading shared by the inference CLIs.

Handles three checkpoint flavors:
  * a diffsep_tpu run directory (contains hparams.yaml + checkpoints/) —
    restores the best (or latest) orbax checkpoint,
  * a specific orbax step directory (run_dir/checkpoints/<step>),
  * a reference PyTorch Lightning checkpoint (.ckpt/.pt, e.g. the HF
    `fakufaku/diffsep` weights, separate.py:25-48) — converts the score
    network and its EMA shadow weights on the fly.

Returns (model, params) where params are the *evaluation* weights: EMA if
available (the reference swaps EMA in on eval(), pl_model.py:650-670).
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional, Tuple

import jax
import numpy as np
import yaml

from ..config.compose import ConfigNode
from ..model import DiffSepModel

log = logging.getLogger(__name__)


def _config_from_hparams(hparams: dict) -> ConfigNode:
    cfg = hparams["config"] if "config" in hparams else hparams
    cfg = ConfigNode.wrap(cfg)
    # reference hparams carry torch _target_ paths; rewrite to ours
    remap = {
        "models.score_models.ScoreModelNCSNpp": "diffsep_tpu.models.ScoreModelNCSNpp",
        "models.ncsnpp.NCSNpp": "diffsep_tpu.models.NCSNpp",
        "sdes.sdes.MixSDE": "diffsep_tpu.sde.MixSDE",
        "sdes.sdes.PriorMixSDE": "diffsep_tpu.sde.PriorMixSDE",
        "sdes.sdes.OUVESDE": "diffsep_tpu.sde.OUVESDE",
        "sdes.sdes.OUVPSDE": "diffsep_tpu.sde.OUVPSDE",
        "models.losses.SISDRLoss": "diffsep_tpu.models.losses.SISDRLoss",
        "models.losses.PESQ": "diffsep_tpu.models.losses.PESQ",
        "utils.FixedClipper": "diffsep_tpu.train.clippers.FixedClipper",
        "utils.AutoClipper": "diffsep_tpu.train.clippers.AutoClipper",
        "torch.optim.Adam": "adam",
        "torch.nn.MSELoss": "mse",
    }

    def walk(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == "_target_" and v in remap:
                    node[k] = remap[v]
                else:
                    walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(cfg)
    return cfg


def _read_torch_checkpoint(path: Path):
    """One torch.load + model build; weight conversion happens per tree."""
    import torch

    ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    cfg = _config_from_hparams(ckpt.get("hyper_parameters", {}))
    return DiffSepModel(cfg), ckpt


def _convert_torch_params(ckpt: dict, use_ema: bool) -> dict:
    from ..models.convert import (
        convert_backbone_state_dict,
        convert_ema_backbone,
    )

    state_dict = ckpt["state_dict"]
    ema = ckpt.get("ema")
    if use_ema and ema is not None and "shadow_params" in ema:
        log.info("using EMA shadow weights from checkpoint")
        backbone = convert_ema_backbone(state_dict, ema["shadow_params"])
    else:
        # raw state_dict weights (reference load_state_dict semantics) —
        # the warm-start path asks for these explicitly with use_ema=False
        backbone = convert_backbone_state_dict(
            state_dict, prefix="score_model.backbone."
        )
    return {"backbone": backbone}


def load_torch_checkpoint(
    path: Path, use_ema: bool = True
) -> Tuple[DiffSepModel, dict]:
    model, ckpt = _read_torch_checkpoint(path)
    return model, _convert_torch_params(ckpt, use_ema)


def load_pretrained_weights(ckpt: str | Path):
    """(model, raw_params, ema_params) for the warm-start path — ONE
    checkpoint read/restore serving both weight trees (load_model twice
    would re-init and re-restore the full state per call)."""
    ckpt = Path(ckpt)
    if ckpt.is_file():
        model, raw_ckpt = _read_torch_checkpoint(ckpt)
        raw = _convert_torch_params(raw_ckpt, use_ema=False)
        ema = _convert_torch_params(raw_ckpt, use_ema=True)
        return model, raw, ema

    run_dir, step = _resolve_run_dir(ckpt, None)
    with open(run_dir / "hparams.yaml") as f:
        cfg = _config_from_hparams(yaml.safe_load(f))
    model = DiffSepModel(cfg)

    import jax.numpy as jnp

    from ..train.checkpoints import CheckpointManager

    mgr = CheckpointManager(run_dir / "checkpoints", best_symlink=False)
    if step is None:
        step = mgr.best_step() or mgr.latest_step()
    fs = int(cfg.model.fs)
    mix0 = jnp.zeros((1, 1, fs), jnp.float32)
    tgt0 = jnp.zeros((1, int(cfg.model.n_speakers), fs), jnp.float32)
    template = jax.device_get(
        model.init_state(jax.random.PRNGKey(0), mix0, tgt0)
    )
    state = mgr.restore(template, step=step)
    mgr.close()
    return (
        model,
        jax.device_get(state.params),
        jax.device_get(state.ema.params),
    )


def _resolve_run_dir(ckpt: Path, step: Optional[int]):
    """Map any run-dir/step-dir path to (run_dir, step); a step-dir path
    (run/checkpoints/<step>, evaluate.py:262 layout) pins the step."""
    if (ckpt / "hparams.yaml").exists():
        return ckpt, step
    if (ckpt.parents[1] / "hparams.yaml").exists():
        if step is None and ckpt.name.isdigit():
            step = int(ckpt.name)
        return ckpt.parents[1], step
    raise FileNotFoundError(f"no hparams.yaml found near {ckpt}")


def resolve_avg_steps(
    ckpt: str | Path, avg_last_k: int, step: Optional[int] = None
) -> list:
    """The checkpoint steps `load_model(avg_last_k=k, step=step)` will
    average: the k most recent, anchored at `step` when given (only steps
    <= step qualify). Cheap directory listing — use this to build result
    tags so the tag records the number ACTUALLY averaged when fewer than
    k checkpoints exist."""
    run_dir, step = _resolve_run_dir(Path(ckpt), step)
    steps = sorted(
        int(p.name)
        for p in (run_dir / "checkpoints").iterdir()
        if p.name.isdigit()
    )
    if step is not None:
        steps = [s for s in steps if s <= step]
        if not steps:
            raise FileNotFoundError(
                f"no checkpoints at or before step {step} in {run_dir}"
            )
    if not steps:
        raise FileNotFoundError(f"no checkpoints in {run_dir}")
    return steps[-avg_last_k:]


def load_model(
    ckpt: str | Path,
    step: Optional[int] = None,
    use_ema: bool = True,
    avg_last_k: Optional[int] = None,
) -> Tuple[DiffSepModel, dict]:
    """Load (model, evaluation params) from any checkpoint flavor.

    `avg_last_k=k` returns the elementwise mean of the k most recent
    checkpoints' evaluation weights (checkpoint averaging / Polyak-style
    ensembling on top of the per-step EMA) — a standard accuracy lever at
    zero inference cost the reference does not ship. An explicit `step`
    (argument or step-dir path) anchors the window: only checkpoints at
    or before it are averaged. Requires an orbax run/step dir (torch
    checkpoints are single files)."""
    ckpt = Path(ckpt)
    if ckpt.is_file():
        if avg_last_k and avg_last_k > 1:
            raise ValueError(
                "avg_last_k needs a run directory with several orbax "
                "checkpoints; a torch .ckpt is a single snapshot"
            )
        return load_torch_checkpoint(ckpt, use_ema=use_ema)

    # run-dir or step-dir layout
    run_dir, step = _resolve_run_dir(ckpt, step)
    # an explicit step (arg or step-dir path) anchors checkpoint averaging
    anchor = step

    with open(run_dir / "hparams.yaml") as f:
        cfg = _config_from_hparams(yaml.safe_load(f))
    model = DiffSepModel(cfg)

    from ..train.checkpoints import CheckpointManager

    mgr = CheckpointManager(run_dir / "checkpoints", best_symlink=False)
    if step is None:
        step = mgr.best_step() or mgr.latest_step()

    # build an abstract state template to restore into
    import jax.numpy as jnp

    fs = int(cfg.model.fs)
    mix0 = jnp.zeros((1, 1, fs), jnp.float32)
    tgt0 = jnp.zeros((1, int(cfg.model.n_speakers), fs), jnp.float32)
    state = model.init_state(jax.random.PRNGKey(0), mix0, tgt0)
    template = jax.device_get(state)

    if avg_last_k and avg_last_k > 1:
        steps = resolve_avg_steps(run_dir, avg_last_k, step=anchor)
        if len(steps) < avg_last_k:
            log.warning(
                "avg_last_k=%d but only %d checkpoints exist; averaging %d",
                avg_last_k, len(steps), len(steps),
            )
        acc = None
        # restores the full TrainState per checkpoint (orbax StandardRestore
        # has no cheap sub-tree restore against our saved layout); params-
        # only restore would cut I/O ~4x if averaging ever becomes hot
        for s in steps:
            st = mgr.restore(template, step=s)
            p = jax.device_get(st.ema.params if use_ema else st.params)
            acc = (
                p
                if acc is None
                else jax.tree_util.tree_map(lambda a, b: a + b, acc, p)
            )
        mgr.close()
        n = float(len(steps))
        params = jax.tree_util.tree_map(
            lambda a: (a / n).astype(a.dtype), acc
        )
        return model, params

    state = mgr.restore(template, step=step)
    mgr.close()
    params = state.ema.params if use_ema else state.params
    return model, params
