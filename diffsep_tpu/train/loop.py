"""The fit loop: epochs, validation, logging, checkpointing.

Capability parity with train.py + the Lightning Trainer behaviours the
reference relies on (SURVEY.md §2.6, §5):
  * run-dir layout exp/<name>/<timestamp>_<overrides>/ with a composed
    `hparams.yaml` next to the checkpoints (consumed by evaluate)
  * TensorBoard scalars at the reference cadence: train/score_loss every
    10 steps (pl_model.py:519-528), grad/norm + grad/clipped_norm +
    grad/step_size every 25 (pl_model.py:624-639), epoch-level
    val/score_loss and val/si_sdr
  * ModelCheckpoint(top_k=20, monitor=val/si_sdr, mode=max) + best-model
    symlink + resume (train.py:105-144)
  * data parallelism: batches sharded over the mesh's dp axis; metric
    reduction is a by-product of jit on sharded arrays (the reference's
    sync_dist=True)
"""
from __future__ import annotations

import logging
import signal
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config.compose import to_dict
from ..model import DiffSepModel
from ..parallel.mesh import make_mesh, replicate_global, shard_batch
from .checkpoints import CheckpointManager

try:
    from tensorboardX import SummaryWriter
except ImportError:  # pragma: no cover
    SummaryWriter = None

log_validate = logging.getLogger(__name__)

# --- graceful preemption (TPU VMs get SIGTERM with a short grace period;
# the reference gets the equivalent from Lightning's SIGTERM handling) ---
_PREEMPT = {"flag": False}


def _on_preempt_signal(signum, frame):
    _PREEMPT["flag"] = True
    log_validate.warning(
        "received signal %d: checkpointing and stopping at the next step "
        "boundary", signum,
    )


def _install_preempt_handler():
    """Install the SIGTERM handler; returns a restore callable (no-op when
    not on the main thread, where signal.signal is unavailable)."""
    _PREEMPT["flag"] = False
    try:
        prev = signal.signal(signal.SIGTERM, _on_preempt_signal)
    except ValueError:  # not the main thread
        return lambda: None
    return lambda: signal.signal(signal.SIGTERM, prev)


def _preempt_agreed(step: int, sync_every: int) -> bool:
    """Whether training should stop for preemption. Multi-process runs
    must AGREE before the collective checkpoint save (the signal usually
    lands on one host only — acting alone would deadlock orbax's save
    barrier), so the local flag is all-gathered at a fixed step cadence;
    every process calls the collective at the same steps."""
    if jax.process_count() == 1:
        return _PREEMPT["flag"]
    if step % sync_every != 0:
        return False
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(
        np.asarray([_PREEMPT["flag"]], np.int32)
    )
    return bool(np.any(flags))


def batch_multiple(n_devices: int = 1, layout: int = 8, max_waste: float = 1.0):
    """Batch-axis multiple for pad_batch_for_tpu: the padded batch must be
    divisible by the dp mesh size (jax.device_put requirement) and wants
    to be a multiple of 8 for XLA layout efficiency. For power-of-two
    meshes lcm(8, n) is 8 or n; for odd mesh sizes the lcm can blow the
    padding up (batch 6 on 3 devices -> 24, 4x the compute), in which
    case correctness wins and the multiple falls back to n_devices."""
    import math

    n = max(int(n_devices), 1)
    m = layout * n // math.gcd(layout, n)
    return m if m <= layout * (1 + max_waste) else n


def pad_batch_for_tpu(mix, target, multiple: int = 8):
    """Pad the batch axis to `multiple` (and return per-sample weights)
    before jit: XLA compiles a batch of 6 into ~4x-slower programs than a
    batch of 8 on TPU (pathological padded layouts — measured in
    scripts/perf_train.py: 500 ms/step vs 147 ms/step for the marginal
    sample count). Filler samples are wrap-repeats of real ones (never
    zeros: degenerate mixture stats) with weight 0, so the weighted loss
    is bit-equivalent to the unpadded mean. `multiple` must account for
    the dp mesh size — use batch_multiple(n_devices)."""
    mix = np.asarray(mix)
    target = np.asarray(target)
    b = mix.shape[0]
    pad = (-b) % multiple
    weight = np.ones(b + pad, np.float32)
    if pad:
        idx = np.arange(b + pad) % b
        mix, target = mix[idx], target[idx]
        weight[b:] = 0.0
    return mix, target, weight


def _restore_for_resume(resume, ckpt, workdir, state):
    """Restore a TrainState for `trainer.resume_from_checkpoint` (reference
    train.py:140-144 passes a checkpoint path to trainer.fit).

    `resume` may be True/"latest" (this run dir's own latest checkpoint —
    in-place restart after preemption) or a path: a run dir (its
    checkpoints/ latest), a checkpoints dir, or one specific orbax step
    dir (`.../checkpoints/<step>` or the best-model symlink). Raises
    instead of silently training from scratch when nothing restorable is
    found."""
    from .checkpoints import CheckpointManager

    state = jax.device_get(state)
    if resume is True or resume == "latest":
        if ckpt.latest_step() is None:
            log_validate.warning(
                "resume requested but %s has no checkpoint yet; "
                "starting fresh", ckpt.directory,
            )
            return state
        return ckpt.restore(state)

    src = Path(resume).expanduser().resolve()  # resolves best-model symlink
    step = None
    if src.name.isdigit() and src.is_dir():
        step = int(src.name)
        src = src.parent
    elif (src / "checkpoints").is_dir():
        src = src / "checkpoints"
    if not src.is_dir():
        raise FileNotFoundError(f"resume_from_checkpoint: {resume} not found")
    if src == ckpt.directory.resolve():  # ckpt stores absolute(), not resolve()d
        return ckpt.restore(state, step=step)
    mgr = CheckpointManager(src, best_symlink=False)
    try:
        restored = mgr.restore(state, step=step)
    finally:
        mgr.close()
    log_validate.info(
        "resumed from %s at step %d", src, int(restored.step)
    )
    return restored


class Logger:
    def __init__(self, logdir):
        self.writer = (
            SummaryWriter(str(logdir))
            if (SummaryWriter and logdir is not None)
            else None
        )

    def log_metrics(self, metrics, step):
        if self.writer is None:
            return
        for k, v in metrics.items():
            self.writer.add_scalar(k, float(v), int(step))

    def close(self):
        if self.writer is not None:
            self.writer.close()


def fit(
    model: DiffSepModel,
    datamodule,
    workdir,
    seed: int = 0,
    max_epochs: Optional[int] = None,
    max_steps: Optional[int] = None,
    check_val_every_n_epoch: int = 1,
    n_devices: Optional[int] = None,
    resume=False,
    log_every: int = 10,
    grad_log_every: int = 25,
    state=None,
    init_params=None,
    init_ema_params=None,
):
    """Train `model` on `datamodule`. Returns the final TrainState."""
    # only the first process writes logs/checkpoints/hparams on multi-host
    # runs (reference: utils.ddp.is_rank_zero gating, train.py:88-93)
    from ..utils.distributed import is_rank_zero

    rank_zero = is_rank_zero()
    workdir = Path(workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    if rank_zero:
        with open(workdir / "hparams.yaml", "w") as f:
            yaml.safe_dump({"config": to_dict(model.config)}, f)

    cfg_trainer = model.config.get("trainer", {}) or {}
    if max_epochs is None:
        max_epochs = int(cfg_trainer.get("max_epochs", 1000))
    if max_steps is None and cfg_trainer.get("max_steps") is not None:
        max_steps = int(cfg_trainer.get("max_steps"))

    # NaN/inf sanitizer — the reference force-enables torch's (slow) anomaly
    # detection (train.py:98); here it is the opt-in trainer.detect_anomaly
    if cfg_trainer.get("detect_anomaly", False):
        jax.config.update("jax_debug_nans", True)
    # profiling: trainer.profiler = true writes a jax.profiler trace under
    # the run dir (reference exposes Lightning's profiler flag, off by
    # default, config/trainer/default.yaml:10)
    profiling = bool(cfg_trainer.get("profiler", False))
    if profiling:
        jax.profiler.start_trace(str(workdir / "profile"))
    check_val_every_n_epoch = int(
        cfg_trainer.get("check_val_every_n_epoch", check_val_every_n_epoch)
    )

    devices = cfg_trainer.get("devices", 1)
    if n_devices is None:
        n_devices = len(jax.devices()) if devices in (-1, "auto") else int(devices)
    mesh = make_mesh(n_devices)

    logger = Logger(workdir / "tb") if rank_zero else Logger(None)
    ckpt = CheckpointManager(
        workdir / "checkpoints",
        max_to_keep=20,
        monitor=model.config.model.get("main_val_loss", "val/si_sdr"),
        mode=model.config.model.get("main_val_loss_mode", "max"),
    )

    key = jax.random.PRNGKey(seed)
    k_init, k_train, k_val, k_sep = jax.random.split(key, 4)

    # --- state init / resume ---
    train_loader = datamodule.train_dataloader()
    if state is None:
        mix0, tgt0 = next(iter(train_loader))
        state = model.init_state(k_init, jnp.asarray(mix0), jnp.asarray(tgt0))
        if init_params is not None:
            # warm start (cfg.load_pretrained): pretrained weights replace
            # the random init; optimizer/step/clip state stay fresh. The
            # tree_map is the strict-load check — a pretrained tree that
            # does not match the architecture fails loudly here (reference
            # intent: load_state_dict(strict=True), train.py:57-60).
            def _graft(a, b):
                b = jnp.asarray(b, a.dtype)
                if a.shape != b.shape:
                    raise ValueError(
                        f"pretrained shape {b.shape} != model {a.shape}"
                    )
                return b

            state = state.replace(
                params=jax.tree_util.tree_map(_graft, state.params,
                                              init_params),
                ema=state.ema._replace(
                    params=jax.tree_util.tree_map(
                        _graft, state.ema.params,
                        init_ema_params
                        if init_ema_params is not None else init_params,
                    )
                ),
            )
        if resume:
            state = _restore_for_resume(resume, ckpt, workdir, state)
    # replicate over the mesh — across processes too on multi-host runs
    # (same-seed init makes every process's host values identical)
    state = replicate_global(state, mesh)

    # ZeRO-style parameter sharding (trainer.strategy: fsdp): parameters,
    # EMA shadow and matching optimizer moments are split over the dp axis;
    # XLA inserts the gathers/scatters (parallel/mesh.py:fsdp_shardings)
    fsdp_multihost = (
        cfg_trainer.get("strategy") == "fsdp" and jax.process_count() > 1
    )
    if cfg_trainer.get("strategy") == "fsdp" and n_devices > 1:
        from ..parallel.mesh import fsdp_shardings

        # trainer.fsdp_min_size: smallest parameter (elements) worth
        # sharding — exposed so tests can force tiny models to shard
        specs = fsdp_shardings(
            state.params, mesh,
            min_size=int(cfg_trainer.get("fsdp_min_size", 2**16)),
        )

        def put_like(tree):
            # jit-identity reshard: works for cross-process shardings,
            # where eager device_put cannot target non-addressable devices
            return jax.jit(lambda t: t, out_shardings=specs)(tree)

        def reshard_matching(node):
            # shard any pytree whose structure matches params (adam mu/nu)
            try:
                return put_like(node)
            except (ValueError, TypeError):
                return node

        state = state.replace(
            params=put_like(state.params),
            ema=state.ema._replace(params=put_like(state.ema.params)),
            opt_state=jax.tree_util.tree_map(
                reshard_matching,
                state.opt_state,
                is_leaf=lambda n: jax.tree_util.tree_structure(n)
                == jax.tree_util.tree_structure(state.params),
            ),
        )

    train_step = jax.jit(model.make_train_step(k_train), donate_argnums=(0,))
    val_loss_fn = jax.jit(model.make_val_loss(k_val))

    # multi-host fsdp: validation/checkpointing need host access to the
    # weights, but cross-process-sharded arrays cannot be device_get.
    # Gather PER LEAF to host (peak extra device memory = one leaf, not a
    # full replicated TrainState — which would defeat fsdp exactly in the
    # does-not-fit regime it exists for). Hoisted jit: one compile per
    # distinct leaf shape for the whole run, not per validation epoch.
    if fsdp_multihost:
        _gather_leaf = jax.jit(
            lambda x: x, out_shardings=NamedSharding(mesh, P())
        )

        def gather_host(tree):
            return jax.tree_util.tree_map(
                lambda x: np.asarray(jax.device_get(_gather_leaf(x))), tree
            )

    step = int(jax.device_get(state.step))
    t_start = time.perf_counter()
    stop = False
    preempted = False
    # trainer.preempt_save (default on): SIGTERM triggers an immediate
    # checkpoint + clean exit instead of losing up to a whole epoch;
    # resume with trainer.resume_from_checkpoint=latest. The cross-process
    # agreement collective runs every preempt_sync_every steps.
    preempt_save = bool(cfg_trainer.get("preempt_save", True))
    preempt_sync_every = max(int(cfg_trainer.get("preempt_sync_every", 25)), 1)
    restore_handler = _install_preempt_handler() if preempt_save else lambda: None

    # multi-process: each process pads its LOCAL loader shard; the global
    # batch (local x n_processes) is then divisible by the global mesh
    # iff the local batch divides the local device count
    pad_mult = batch_multiple(
        jax.local_device_count() if jax.process_count() > 1 else n_devices
    )
    for epoch in range(max_epochs):
        for mix, target in train_loader:
            mix, target, weight = pad_batch_for_tpu(mix, target, pad_mult)
            # hand shard_batch the host numpy directly: a jnp.asarray here
            # would upload to the default device only for shard_batch's
            # multi-process path to pull it back to host and re-upload
            batch = shard_batch((mix, target, weight), mesh)
            state, metrics = train_step(state, *batch)
            step += 1
            if step % log_every == 0:
                logger.log_metrics(
                    {"train/score_loss": metrics["train/score_loss"]}, step
                )
            if step % grad_log_every == 0:
                logger.log_metrics(
                    {
                        "grad/norm": metrics["grad/norm"],
                        "grad/clipped_norm": metrics["grad/clipped_norm"],
                        "grad/step_size": metrics["grad/step_size"],
                    },
                    step,
                )
            if max_steps is not None and step >= max_steps:
                stop = True
                break
            if preempt_save and _preempt_agreed(step, preempt_sync_every):
                stop = preempted = True
                break

        if preempted:
            # save NOW and skip validation — the preemption grace period is
            # short; the checkpoint carries no metrics so it never becomes
            # best-model, only the resume point
            ckpt.save(
                step,
                gather_host(state) if fsdp_multihost else jax.device_get(state),
                {},
            )
            log_validate.warning("preemption checkpoint saved at step %d", step)
        elif (epoch + 1) % check_val_every_n_epoch == 0 or stop:
            if fsdp_multihost:
                # validate only touches the EMA weights; keep the rest of
                # the state sharded
                io_state = state.replace(
                    ema=state.ema._replace(
                        params=gather_host(state.ema.params)
                    )
                )
            else:
                io_state = state
            val_metrics = validate(model, datamodule, io_state, val_loss_fn, k_sep, mesh)
            logger.log_metrics(val_metrics, step)
            # ALL processes call save: orbax's CheckpointManager runs an
            # internal cross-process barrier on multi-host runs, so a
            # rank-gated call deadlocks the primary (measured: shutdown
            # barrier timeout in the 2-process fit test). Orbax itself
            # writes data from the primary host only; the checkpoint dir
            # must be shared storage. Host-side extras (best symlink) are
            # rank-gated inside CheckpointManager.
            ckpt.save(
                step,
                gather_host(state) if fsdp_multihost else jax.device_get(state),
                val_metrics,
            )
        if stop:
            break

    restore_handler()
    if profiling:
        jax.profiler.stop_trace()
    logger.close()
    ckpt.close()
    # record the outcome for callers: after a preemption save the process
    # must exit promptly (cli/train.py skips the post-train test eval —
    # minutes of inference the SIGTERM grace window does not have)
    global LAST_FIT_PREEMPTED
    LAST_FIT_PREEMPTED = preempted
    return state


# whether the most recent fit() in this process stopped for preemption
LAST_FIT_PREEMPTED = False


def validate(model, datamodule, state, val_loss_fn, key, mesh):
    """Validation: score loss over the full loader + PC separation metrics
    on the first valid_max_sep_batches batches (pl_model.py:540-564)."""
    losses = []
    sep_metrics = {name: [] for name in model.val_losses}
    n_sep_done = 0
    # ALL of validation runs under the EMA weights — the reference swaps
    # EMA in on eval() before computing the val score loss too
    # (pl_model.py:650-670: eval() -> ema.copy_to), not just separation.
    # Multi-process: the state lives on the global mesh while validation
    # batches are process-local (the val loader is unsharded), so pull a
    # host-local copy of the replicated weights once per validation pass —
    # and pin it to a LOCAL device: leaving it as host numpy would make
    # every jitted val/sep call below re-upload the whole parameter tree.
    ema_params = state.ema.params
    if jax.process_count() > 1:
        ema_params = jax.device_put(
            jax.device_get(ema_params), jax.local_devices()[0]
        )
    for i, (mix, target) in enumerate(datamodule.val_dataloader()):
        mix = jnp.asarray(mix)
        target = jnp.asarray(target)
        losses.append(
            float(val_loss_fn(ema_params, mix, target, jnp.asarray(i)))
        )
        if n_sep_done < model.valid_max_sep_batches:
            n_sep_done += 1
            est, _ = model.separate(
                ema_params, jax.random.fold_in(key, i), mix
            )
            for name, loss in model.val_losses.items():
                try:
                    sep_metrics[name].append(float(loss(est, target)))
                except Exception as e:
                    # a metric must never kill training: e.g. PESQ raises
                    # on <250 ms or silent validation clips
                    log_validate.warning("val metric %s failed: %s", name, e)
    out = {"val/score_loss": float(np.mean(losses))}
    for name, vals in sep_metrics.items():
        if vals:
            out[name] = float(np.mean(vals))
    return out
