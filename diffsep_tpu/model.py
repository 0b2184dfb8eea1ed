"""DiffSepModel — the high-level training/inference façade.

Capability parity with pl_model.DiffSepModel (pl_model.py:95-759), minus
Lightning: the model owns the score network definition, the SDE, the loss
configuration, the optimizer/EMA/clipping setup and the samplers, but state
(parameters, optimizer, EMA) lives in an explicit TrainState pytree.

Construction consumes the composed config tree (config.model.*) with the
same keys as the reference's hydra config.
"""
from __future__ import annotations

import importlib
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.jit,
    static_argnames=(
        "model",
        "predictor_name",
        "corrector_name",
        "N",
        "denoise",
        "eps",
        "snr",
        "corrector_steps",
        "probability_flow",
        "intermediate",
        "schedule",
    ),
)
def _jit_pc_sample(
    model,
    params,
    key,
    y,
    predictor_name="reverse_diffusion",
    corrector_name="ald2",
    N=None,
    denoise=True,
    eps=3e-2,
    snr=0.1,
    corrector_steps=1,
    probability_flow=False,
    intermediate=False,
    schedule=None,
):
    """One compiled program for the entire reverse process: prior sampling,
    all N corrector+predictor steps, final denoise. Cached per (model,
    sampler settings, input shape) so repeated calls are pure device
    execution — the TPU answer to the reference's per-step host dispatch
    loop (SURVEY.md §3.4)."""
    from .sampling.pc import pc_sample

    score_fn = lambda x, t, m: model.score_apply(params, x, t, m)
    return pc_sample(
        key,
        model.sde,
        score_fn,
        y,
        predictor_name,
        corrector_name,
        N=N,
        denoise=denoise,
        eps=eps,
        snr=snr,
        corrector_steps=corrector_steps,
        probability_flow=probability_flow,
        intermediate=intermediate,
        schedule=schedule,
    )

from .config import instantiate
from .models.score_model import ScoreModelNCSNpp
from .sampling.pc import ode_sample, pc_sample
from .train.losses import (
    denormalize_batch,
    normalize_batch,
    normalize_batch_masked,
)
from .train.trainer import (
    LossConfig,
    OptimConfig,
    init_train_state,
    make_clipper,
    make_optimizer,
    make_train_step,
    make_val_score_loss,
)

Array = jax.Array


def _warn_low_n_schedule(sde, predictor_name, N, schedule):
    """Measured low-NFE linear-grid pathology guard (see
    DiffSepModel._check_low_n_schedule for the rationale).  Module-level so
    duck-typed models that reuse DiffSepModel.separate unbound (only the
    {sde, t_eps, sampler_kwargs, score_apply} contract) hit the guard
    without needing the method."""
    n_eff = sde.N if N is None else int(N)
    if (
        predictor_name in ("ddim", "dpmpp")
        and n_eff <= 2
        and schedule in (None, "linear")
    ):
        import warnings

        grid = "default linear" if schedule is None else "linear"
        warnings.warn(
            f"predictor '{predictor_name}' with N={n_eff} on the {grid} "
            "time grid degenerates (measured -3.3 dB vs 17.1 dB on the "
            "log grid at N=2); pass schedule='log' — and serve a "
            "log-grid-distilled student (diffsep-distill) for best "
            "low-NFE quality. See README 'Progressive distillation'.",
            stacklevel=3,
        )


def _tupled(v):
    return tuple(v) if isinstance(v, (list, tuple)) else v


def build_score_model(sm_cfg):
    """Build the Flax score model from the score_model config node
    (mirrors the ctor channel inference at score_models.py:24-26)."""
    num_sources = int(sm_cfg["num_sources"])
    backbone_args = dict(sm_cfg["backbone_args"])
    target = backbone_args.pop("_target_")
    mod_name, _, cls_name = target.rpartition(".")
    backbone_cls = getattr(importlib.import_module(mod_name), cls_name)
    backbone_args = {k: _tupled(v) for k, v in backbone_args.items()}

    wrapper = sm_cfg.get("_target_", "")
    if wrapper.endswith("ScoreModelDiffuSE"):
        # time-domain variant: channels are waveform sources
        from .models.score_model_diffuse import ScoreModelDiffuSE

        backbone_args.update(
            num_channels_in=num_sources, num_channels_out=num_sources
        )
        return ScoreModelDiffuSE(
            backbone=backbone_cls(**backbone_args), num_sources=num_sources
        )

    backbone_args.update(
        num_channels_in=2 * num_sources + 2, num_channels_out=2 * num_sources
    )
    backbone = backbone_cls(**backbone_args)

    stft_args = sm_cfg.get("stft_args", {}) or {}
    return ScoreModelNCSNpp(
        backbone=backbone,
        num_sources=num_sources,
        n_fft=int(stft_args.get("n_fft", 510)),
        hop_length=int(stft_args.get("hop_length", 128)),
        center=bool(stft_args.get("center", True)),
        transform=sm_cfg.get("transform", "exponent"),
        spec_abs_exponent=float(sm_cfg.get("spec_abs_exponent", 0.5)),
        spec_factor=float(sm_cfg.get("spec_factor", 3.0)),
        spec_trans_learnable=bool(sm_cfg.get("spec_trans_learnable", False)),
    )


class DiffSepModel:
    def __init__(self, config):
        self.config = config
        m = config.model

        self.score_model = build_score_model(m.score_model)
        self.sde = instantiate(m.sde)
        self.t_eps = float(m.t_eps)
        self.t_max = self.sde.T

        self.loss_cfg = LossConfig(
            t_eps=self.t_eps,
            t_rev_init=float(m.get("t_rev_init", 0.03)),
            init_hack=m.get("init_hack", False),
            init_hack_p=float(m.get("init_hack_p", 1.0 / self.sde.N)),
            train_source_order=str(m.get("train_source_order", "random")),
            mmnr_thresh_pit=float(m.get("mmnr_thresh_pit", -10.0)),
            time_sampling_strategy=m.get("time_sampling_strategy", "uniform"),
        )

        clip_cfg = m.get("grad_clipper") or {}
        clip_target = clip_cfg.get("_target_", "")
        if clip_target.endswith("FixedClipper"):
            clip_kind, clip_max, clip_p = "fixed", float(clip_cfg.get("max_norm", 5.0)), 10.0
        elif clip_target.endswith("AutoClipper"):
            clip_kind, clip_max, clip_p = "autoclip", 5.0, float(clip_cfg.get("p", 10.0))
        else:
            clip_kind, clip_max, clip_p = "none", 5.0, 10.0

        # optional LR scheduler (reference pl_model.py:592-597)
        sched_cfg = m.get("scheduler") or {}
        sched_target = (
            sched_cfg.get("_target_", "") if isinstance(sched_cfg, dict) else ""
        )
        if sched_target.endswith("ExponentialLR"):
            scheduler = "exponential"
        elif sched_target.endswith("StepLR"):
            scheduler = "step"
        elif sched_target.endswith("CosineAnnealingLR"):
            scheduler = "cosine"
        elif isinstance(sched_cfg, dict) and sched_cfg.get("name"):
            scheduler = sched_cfg["name"]
        else:
            scheduler = None

        trainer_cfg = config.get("trainer", {}) or {}
        self.optim_cfg = OptimConfig(
            lr=float(m.optimizer.lr),
            weight_decay=float(m.optimizer.get("weight_decay", 0.0)),
            lr_warmup=m.get("lr_warmup"),
            accumulate_grad_batches=int(
                trainer_cfg.get("accumulate_grad_batches", 1)
            ),
            ema_decay=float(m.get("ema_decay", 0.999)),
            grad_clipper=clip_kind,
            clip_max_norm=clip_max,
            autoclip_percentile=clip_p,
            scheduler=scheduler,
            scheduler_gamma=float(sched_cfg.get("gamma", 0.99))
            if isinstance(sched_cfg, dict) else 0.99,
            scheduler_step_size=int(sched_cfg.get("step_size", 1000))
            if isinstance(sched_cfg, dict) else 1000,
            scheduler_t_max=int(sched_cfg.get("T_max", 100000))
            if isinstance(sched_cfg, dict) else 100000,
        )
        self.valid_max_sep_batches = int(m.get("valid_max_sep_batches", 1))
        self.sampler_kwargs = dict(m.get("sampler", {}) or {})

        self.val_losses = {}
        for name, args in (m.get("val_losses") or {}).items():
            self.val_losses[name] = instantiate(args)

        self.tx = make_optimizer(self.optim_cfg)
        self.clipper = make_clipper(self.optim_cfg)

    # --- parameter / state management ---
    def init_params(self, key: jax.Array, example_mix: Array, example_tgt: Array):
        # Parameter shapes are batch- and length-independent (the models
        # are fully convolutional / chunked over time and serve variable-
        # length utterances with one param set — the serve engines bucket
        # lengths over shared params), so initialize on a batch-1,
        # truncated-length example: flax init runs a full forward pass,
        # and this cuts its FLOPs by ~1000x at the bench operating shape —
        # which is what makes the CPU-backend execution below affordable.
        n_init = min(example_mix.shape[-1], 4096)
        example_mix = jnp.asarray(example_mix[:1, :, :n_init])
        example_tgt = jnp.asarray(example_tgt[:1, :, :n_init])
        t = jnp.full((1,), 0.5)

        # jit the init (eager initialization dispatches thousands of single
        # ops — minutes over a remote TPU link), but have the compiled
        # program return ONE flat vector per dtype instead of the ~500-leaf
        # param tree: the axon runtime charges ~0.3 s per OUTPUT buffer on
        # an executable's first call (measured: a trivial 500-output program
        # costs 150 s on call 1, 0.5 s on call 2 — pure runtime overhead,
        # re-paid by every process, invisible to the compilation cache),
        # while device_put of 500 host arrays costs ~0.5 s.  So: flat out,
        # split on host, device_put the tree back.  Values are identical —
        # same program, concatenated.
        def _init(k):
            return self.score_model.init(k, example_tgt, t, example_mix)[
                "params"
            ]

        abstract = jax.eval_shape(_init, key)
        leaves, treedef = jax.tree_util.tree_flatten(abstract)
        dtypes = sorted({str(l.dtype) for l in leaves})

        def _init_flat(k):
            flat = jax.tree_util.tree_leaves(_init(k))
            return {
                d: jnp.concatenate(
                    [jnp.ravel(l) for l in flat if str(l.dtype) == d]
                )
                for d in dtypes
            }

        # run the init program on the LOCAL CPU backend when the default
        # backend is remote: the flat result (~260 MB for the flagship)
        # would otherwise come back through the ~38 MB/s axon-tunnel D2H —
        # measured ~540 s of pure transfer per process, re-paid by every
        # CLI start and invisible to the compilation cache.  JAX's
        # threefry PRNG is bit-deterministic across backends, so the
        # values match a device-side init; device_put back up rides the
        # fast H2D direction.  Falls through to the default device when no
        # CPU backend exists.
        try:
            run_dev = (
                None
                if jax.default_backend() == "cpu"
                else jax.devices("cpu")[0]
            )
        except RuntimeError:
            run_dev = None
        if run_dev is not None:
            with jax.default_device(run_dev):
                flat = jax.jit(_init_flat)(jax.device_put(key, run_dev))
        else:
            flat = jax.jit(_init_flat)(key)
        host = {d: np.asarray(v) for d, v in jax.device_get(flat).items()}
        offs = {d: 0 for d in dtypes}
        out = []
        for l in leaves:
            d, n = str(l.dtype), int(np.prod(l.shape, dtype=np.int64))
            out.append(host[d][offs[d]:offs[d] + n].reshape(l.shape))
            offs[d] += n
        return jax.device_put(jax.tree_util.tree_unflatten(treedef, out))

    def init_state(self, key, example_mix, example_tgt):
        params = self.init_params(key, example_mix, example_tgt)
        return init_train_state(params, self.tx, self.clipper)

    def score_apply(self, params, x, t, mix):
        return self.score_model.apply({"params": params}, x, t, mix)

    def load_torch_checkpoint(self, state_dict: Dict[str, Any]):
        """Convert a reference Lightning checkpoint's score-model weights
        (keys 'score_model.backbone.*', separate.py:36-48)."""
        from .models.convert import convert_backbone_state_dict

        params = {
            "backbone": convert_backbone_state_dict(
                state_dict, prefix="score_model.backbone."
            )
        }
        return params

    # --- training ---
    def make_train_step(self, base_key: jax.Array):
        return make_train_step(
            self.score_apply,
            self.sde,
            self.tx,
            self.clipper,
            self.loss_cfg,
            self.optim_cfg,
            base_key,
        )

    def make_val_loss(self, base_key: jax.Array):
        return make_val_score_loss(
            self.score_apply, self.sde, self.loss_cfg, base_key
        )

    def make_distill_step(self, base_key: jax.Array, distill_cfg=None, **kw):
        """Progressive-distillation step (train/distill.py) — beyond-
        reference low-NFE capability. `kw` overrides DistillConfig fields;
        defaults inherit this model's t_eps and source-order convention."""
        import dataclasses

        from .train.distill import DistillConfig
        from .train.distill import make_distill_step as _make

        if distill_cfg is None:
            fields = dict(
                t_eps=self.t_eps,
                source_order=self.loss_cfg.train_source_order,
            )
            fields.update(kw)  # kw may override the model-derived defaults
            distill_cfg = DistillConfig(**fields)
        elif kw:
            # silently dropping kw would train at the cfg's values while
            # the caller believes its overrides took effect
            distill_cfg = dataclasses.replace(distill_cfg, **kw)
        return _make(
            self.score_apply,
            self.sde,
            self.tx,
            self.clipper,
            self.optim_cfg,
            base_key,
            distill_cfg,
        )

    def _check_low_n_schedule(self, predictor_name, N, schedule):
        """Warn on the measured low-NFE linear-grid pathology: DDIM-family
        sampling at N<=2 on the default/linear time grid produces
        garbage-quality output (demo task: -3.3 dB vs 17.1 dB on the log
        grid at N=2 — BENCH_r04 quality_distill_demo), because the linear
        2-point grid spends its single interior step at t where the
        transport ratio is ill-conditioned.  The reference's scheduled
        sampler (sdes/__init__.py:46-129) has the same trap, unguarded.

        Note for duck-typed callers: separate()/get_pc_sampler() only
        require the {sde, t_eps, sampler_kwargs, score_apply} contract
        (tests/test_parallel.py builds such a model), so the guard is
        routed through ``_warn_low_n_schedule`` by explicit module-level
        call, not attribute lookup on ``self``."""
        _warn_low_n_schedule(self.sde, predictor_name, N, schedule)

    # --- inference (pl_model.py:148-164, 687-759) ---
    def separate(self, params, key, mix, **kwargs):
        kw = dict(
            predictor_name="reverse_diffusion",
            corrector_name="ald2",
            eps=self.t_eps,
        )
        kw.update(self.sampler_kwargs)
        kw.update(kwargs)
        _warn_low_n_schedule(
            self.sde, kw["predictor_name"], kw.get("N"), kw.get("schedule")
        )
        (mix_n, _), mean, std = normalize_batch(mix, None)
        est, nfe = _jit_pc_sample(self, params, key, mix_n, **kw)
        return denormalize_batch(est, mean, std), nfe

    def separate_masked(self, params, key, mix, n_valid, **kwargs):
        """separate() for zero-padded batches: normalization statistics come
        from each row's true span ``[:, :n_valid[b]]`` only and the pad
        region of the estimate is zeroed. This is the static-shape serving
        path (one compiled program / one exported artifact serves any
        request length <= n_samples); padding BEFORE plain separate() would
        fold the zero tail into the stats and feed the network an
        off-distribution input — and since (x-mean)/std is affine-invariant
        the caller cannot compensate from outside the program."""
        kw = dict(
            predictor_name="reverse_diffusion",
            corrector_name="ald2",
            eps=self.t_eps,
        )
        kw.update(self.sampler_kwargs)
        kw.update(kwargs)
        _warn_low_n_schedule(
            self.sde, kw["predictor_name"], kw.get("N"), kw.get("schedule")
        )
        n_valid = jnp.clip(
            jnp.asarray(n_valid, jnp.int32), 1, mix.shape[-1]
        )
        mix_n, mean, std = normalize_batch_masked(mix, n_valid)
        est, nfe = _jit_pc_sample(self, params, key, mix_n, **kw)
        mask = (
            jnp.arange(mix.shape[-1])[None, None, :]
            < n_valid[:, None, None]
        ).astype(est.dtype)
        return denormalize_batch(est, mean, std) * mask, nfe

    def get_pc_sampler(
        self,
        predictor_name: str,
        corrector_name: str,
        y: Array,
        params,
        key: Optional[jax.Array] = None,
        N: Optional[int] = None,
        minibatch: Optional[int] = None,
        schedule: Optional[str] = None,
        **kwargs,
    ):
        """API parity with pl_model.py:687-759. `minibatch` chunks the batch
        (useful to bound memory on very long utterances)."""
        _warn_low_n_schedule(self.sde, predictor_name, N, schedule)
        key = key if key is not None else jax.random.PRNGKey(0)
        kwargs = {"eps": self.t_eps, **kwargs}

        if minibatch is None:
            def sampler(key=key):
                return _jit_pc_sample(
                    self, params, key, y,
                    predictor_name, corrector_name,
                    N=N, schedule=schedule, **kwargs,
                )
            return sampler

        def batched_sampler(key=key):
            import math as _math

            M = y.shape[0]
            samples, ns = [], []
            for i in range(_math.ceil(M / minibatch)):
                k = jax.random.fold_in(key, i)
                y_mini = y[i * minibatch : (i + 1) * minibatch]
                s, n = _jit_pc_sample(
                    self, params, k, y_mini,
                    predictor_name, corrector_name,
                    N=N, schedule=schedule, **kwargs,
                )
                samples.append(s)
                ns.append(n)
            return jnp.concatenate(samples, axis=0), ns

        return batched_sampler
