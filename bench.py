#!/usr/bin/env python
"""Benchmark: WSJ0-2mix-style separation throughput at the reference
operating point (N=30 reverse steps, snr=0.5, corrector_steps=1 => 60
network evaluations per utterance, config/model/default.yaml:39-42).

Prints the graded JSON line {"metric", "value", "unit", "vs_baseline", ...}
IMMEDIATELY after the N=30 fused measurement — the only mandatory phase —
then, time permitting, re-prints a superset line with the DDIM-N6 fast-path
throughput appended.  (Round 3 printed the line only at the very end and
the driver's budget expired mid-extras: BENCH_r03.json rc=124, parsed=null,
losing a measured 3.423 utt/s.  The last JSON line on stdout is always a
complete, self-contained record.)

value        = utterances/sec/chip for the flagship nf=128 NCSN++ +
               MixSDE PC sampler on 5 s 8 kHz utterances, batched.
vs_baseline  = speedup over a reference-architecture execution shape on
               the SAME chip: batch size 1 with each sampler step
               dispatched from the host (the per-step loop of
               evaluate.py:322-376 / SURVEY.md §3.4, with every step
               jit-compiled — i.e. a best-case rendition of the PyTorch
               execution model), versus the TPU-native whole-process
               lax.scan over a batch.  The baseline is a known quantity
               measured live in rounds 1-3 (2.168 / 2.330 / 2.309 utt/s);
               by default the conservative max (2.330) is used so the
               graded line never waits ~3 min on a re-measurement.  Set
               BENCH_RUN_REF=1 to re-measure it live (runs first, in a
               timeout-guarded subprocess, before this process claims the
               TPU).

quality_nfe_sweep_demo = SI-SDR (dB) of the low-NFE predictors at
               N in {4,6,8} on the demo-trained model (scripts/train_demo.py,
               regenerated this round; see that file for provenance) so the
               fast-path throughput travels with the quality it buys.

Timing forces a device->host transfer (jax.device_get) because async
dispatch otherwise returns before execution completes.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from diffsep_tpu.compilation_cache import enable as _enable_cache

_enable_cache()

T_START = time.perf_counter()
# Extras (DDIM) only start if elapsed time is below this; the graded line
# has already been printed by then either way.
BUDGET_S = float(os.environ.get("BENCH_BUDGET", "420"))

# Reference-style baseline on this chip, measured live in rounds 1-3 and
# re-validated round 5 (2026-08-20): 2.168 / 2.330 / 2.309 / 2.304 utt/s —
# the round-5 BENCH_RUN_REF=1 refresh landed within 1.1% of this recorded
# constant, so it stands.  Conservative max of the series.
RECORDED_REF = 2.330


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x) -> None:
    np.asarray(jax.device_get(x))


def elapsed() -> float:
    return time.perf_counter() - T_START


def build():
    from diffsep_tpu.config import compose
    from diffsep_tpu.model import DiffSepModel

    overrides = ["experiment=icassp-separation"]
    if os.environ.get("BENCH_DTYPE", "bfloat16") == "bfloat16":
        overrides.append("model.score_model.backbone_args.dtype=bfloat16")
    cfg = compose(overrides)
    model = DiffSepModel(cfg)
    fs = 8000
    n_samples = 5 * fs
    # round-3 clean sweep on this chip: N30 fused 32: 3.406, 48: 3.455,
    # 56: 3.452, 64: 3.296 -> 48 peak (48-56 is a plateau); DDIM N6
    # 32: 26.7, 48: 27.1, 64: 28.0 -> 64 peak. Each operating point runs
    # at its own measured peak batch.
    batch = int(os.environ.get("BENCH_BATCH", "48"))
    ddim_batch = int(os.environ.get("BENCH_DDIM_BATCH", "64"))
    rng = np.random.default_rng(0)
    b = max(batch, ddim_batch)
    mix_all = jnp.asarray(
        rng.standard_normal((b, 1, n_samples)), jnp.float32
    ) * 0.1
    tgt = jnp.zeros((batch, 2, n_samples), jnp.float32)
    mix = mix_all[:batch]
    params = model.init_params(jax.random.PRNGKey(0), mix, tgt)
    sync(jax.tree_util.tree_leaves(params)[0])
    return model, params, mix, mix_all[:ddim_batch]


def _measure_windows(run_one, batch, n_windows, iters_per_window, label):
    """Median throughput over independent timing windows. The 1-core host
    suffers transient load spikes that only ever bias throughput DOWN
    (measured: 10-20% spread for ~2 s DDIM runs, ~2% for 14 s N=30 runs);
    the median of several windows discards those one-sided outliers
    without cherry-picking a best case."""
    vals = []
    seed = 1
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(iters_per_window):
            run_one(seed)
            seed += 1
        dt = (time.perf_counter() - t0) / iters_per_window
        vals.append(batch / dt)
    log(f"{label} windows: " + " ".join(f"{v:.3f}" for v in vals))
    return float(np.median(vals))


def _measure_pipelined(dispatch, batch, n_windows, iters_per_window, label):
    """Depth-1 pipelined throughput: batch k+1 is dispatched before batch
    k's device_get, overlapping the ~38 MB/s axon-tunnel D2H transfer with
    the next batch's compute — exactly how cli/serve.py runs (e352a53).
    Requires iters_per_window >= 2: with a single iteration the overlap
    benefit lands outside the timed window."""
    vals, seed = [], 1001
    for _ in range(n_windows):
        pending = dispatch(seed)
        seed += 1
        t0 = time.perf_counter()
        for _ in range(iters_per_window):
            nxt = dispatch(seed)
            seed += 1
            sync(pending)
            pending = nxt
        vals.append(
            batch * iters_per_window / (time.perf_counter() - t0)
        )
        sync(pending)
    log(f"{label} pipelined windows: " + " ".join(f"{v:.3f}" for v in vals))
    return float(np.median(vals))


def bench_fused(model, params, mix, n_windows=3):
    """TPU-native: whole PC reverse process in one jit'd scan, batched."""
    est, _ = model.separate(params, jax.random.PRNGKey(0), mix)
    sync(est)  # compile + first run
    log(f"fused: compiled (t={elapsed():.0f}s)")

    def run_one(seed):
        est, _ = model.separate(params, jax.random.PRNGKey(seed), mix)
        sync(est)

    return _measure_windows(run_one, mix.shape[0], n_windows, 1, "fused")


def bench_fused_pipelined(model, params, mix, n_windows=2,
                          iters_per_window=2):
    """Graded N=30 path under the serving engines' depth-1 pipelining
    (VERDICT r4 item 4): the sequential number stays the graded `value`
    for series continuity; this reports what the D2H overlap recovers
    (~3% expected at N=30, where the transfer is a small fraction of a
    ~14 s step)."""
    def dispatch(seed):
        est, _ = model.separate(params, jax.random.PRNGKey(seed), mix)
        return est

    return _measure_pipelined(
        dispatch, mix.shape[0], n_windows, iters_per_window, "fused"
    )


def bench_ddim(model, params, mix, n_windows=4, iters_per_window=4, N=6,
               schedule=None):
    """Beyond-parity fast path: exact-transition DDIM, no corrector
    (sampling/predictors.py). Tracked in the graded artifact so regressions
    in either operating point get caught. Each run is only ~2 s, so the
    windows are multi-iteration before taking the median. N=2 on the log
    grid is the progressive-distillation serving point
    (train/distill.py — see quality_distill_demo for its quality record).

    Returns (sequential, pipelined): sequential syncs each batch before
    dispatching the next (the r1-r4 series' definition, kept for
    continuity); pipelined dispatches batch k+1 before device_get of
    batch k, overlapping the ~38 MB/s axon-tunnel D2H transfer (~0.5 s
    for a 20 MB batch — 37% of an N=2 step) with the next batch's
    compute, which is how cli/serve.py actually runs. Measured
    scripts/pipeline_throughput.py: N=2-log 53.7 -> 90.4 utt/s (1.68x),
    N=6 26.6 -> 33.0 (1.24x); the device-only compute rate is 98.4 /
    34.4, so depth-1 pipelining recovers ~92-96% of the transfer cost."""
    kw = dict(predictor_name="ddim", corrector_name="none", N=N,
              schedule=schedule)
    est, _ = model.separate(params, jax.random.PRNGKey(0), mix, **kw)
    sync(est)  # compile + first run
    log(f"ddim N={N}: compiled (t={elapsed():.0f}s)")

    def run_one(seed):
        est, _ = model.separate(params, jax.random.PRNGKey(seed), mix, **kw)
        sync(est)

    seq = _measure_windows(
        run_one, mix.shape[0], n_windows, iters_per_window, f"ddim-N{N}"
    )

    def dispatch(seed):
        est, _ = model.separate(params, jax.random.PRNGKey(seed), mix, **kw)
        return est

    pipe = _measure_pipelined(
        dispatch, mix.shape[0], n_windows, iters_per_window, f"ddim-N{N}"
    )
    return seq, pipe


def bench_reference_style(model, params, mix):
    """Reference execution shape: batch 1, per-step host dispatch (each
    step a single jitted function; keys precomputed on host)."""
    from diffsep_tpu.sampling.correctors import AnnealedLangevinDynamics2
    from diffsep_tpu.sampling.predictors import ReverseDiffusionPredictor
    from diffsep_tpu.train.losses import normalize_batch

    sde = model.sde
    score_fn = lambda x, t, m: model.score_apply(params, x, t, m)
    pred = ReverseDiffusionPredictor(sde, score_fn)
    corr = AnnealedLangevinDynamics2(sde, score_fn, snr=0.5, n_steps=1)

    @jax.jit
    def step(x, t_scalar, kc, kp, mix_n):
        t = jnp.full((x.shape[0],), t_scalar, x.dtype)
        x, _ = corr.update(kc, x, t, mix_n)
        x, x_mean = pred.update(kp, x, t, mix_n)
        return x, x_mean

    @jax.jit
    def prep(key, mix1):
        (mix_n, _), _, _ = normalize_batch(mix1, None)
        return mix_n, sde.prior_sampling(key, mix_n)

    mix1 = mix[:1]
    ts = np.linspace(sde.T, 0.03, sde.N)

    # one jitted program for all per-step keys: eager per-key ops would
    # each pay a full host<->device round trip
    @jax.jit
    def make_keys(base):
        def per_step(i):
            kc, kp = jax.random.split(jax.random.fold_in(base, i))
            return kc, kp

        return jax.vmap(per_step)(jnp.arange(sde.N))

    kcs, kps = jax.device_get(make_keys(jax.random.PRNGKey(0)))
    host_keys = [(jnp.asarray(kcs[i]), jnp.asarray(kps[i])) for i in range(sde.N)]

    def run(seed):
        mix_n, x = prep(jax.random.PRNGKey(seed), mix1)
        x_mean = x
        for i in range(sde.N):
            kc, kp = host_keys[i]
            x, x_mean = step(x, ts[i], kc, kp, mix_n)
        sync(x_mean)

    run(0)  # compile
    log("reference-style: compiled")
    n_iter = 2
    t0 = time.perf_counter()
    for i in range(n_iter):
        run(i + 1)
    dt = (time.perf_counter() - t0) / n_iter
    return 1.0 / dt


def _load_quality_sweep():
    """N-sweep SI-SDR of the fast-path predictors on the demo-trained model
    (VERDICT r3 item 8): assembled from scripts/train_demo_result.json's
    flat si_sdr_* keys (written by scripts/train_demo.py — the N=30 PC
    anchor, the mixture floor, and ddim/dpmpp at N in {4,6,8}).  If the
    stored record predates the sweep keys, the field is omitted rather
    than faked."""
    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "scripts", "train_demo_result.json")
        with open(path) as f:
            rec = json.load(f)
        sweep = {
            k: v for k, v in rec.items()
            if k.startswith("si_sdr_") and isinstance(v, (int, float))
        }
        # require at least one actual N-sweep entry, not just the anchors
        if any("_n4_" in k or "_n6_" in k or "_n8_" in k for k in sweep):
            sweep["train_steps"] = rec.get("steps")
            return sweep
        log("quality sweep keys absent from train_demo_result.json")
    except Exception as e:  # pragma: no cover - diagnostics only
        log(f"quality sweep unavailable ({e})")
    return None


def _load_distill_sweep():
    """Progressive-distillation quality record (scripts/distill_demo.py):
    teacher-vs-student SI-SDR per serving N on the demo task. File read
    only — the distillation itself is a training job, never run here."""
    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "scripts", "distill_demo_result.json")
        with open(path) as f:
            rec = json.load(f)
        keep = {
            k: v for k, v in rec.items()
            if k.startswith("si_sdr_") and isinstance(v, (int, float))
        }
        if any(k.startswith("si_sdr_student_") for k in keep):
            keep["distill_steps_per_stage"] = rec.get(
                "distill_steps_per_stage"
            )
            try:
                # the N=2 serving point lives on the log grid (README:
                # the linear 2-point grid degenerates); attach its record
                # when scripts/distill_demo.py --schedule log has run.
                lpath = os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "scripts", "distill_demo_log_result.json")
                with open(lpath) as f:
                    lrec = json.load(f)
                keep["log_grid"] = {
                    k: v for k, v in lrec.items()
                    if k.startswith("si_sdr_") and isinstance(v, (int, float))
                }
            except Exception:
                pass
            try:
                # enhancement-recipe distillation record (VERDICT r4 item
                # 6): teacher PESQ/SI-SDR vs distilled students on model=nr
                # (scripts/distill_demo_nr.py)
                npath = os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "scripts", "distill_demo_nr_result.json")
                with open(npath) as f:
                    nrec = json.load(f)
                keep["nr"] = {
                    k: v for k, v in nrec.items()
                    if (k.startswith("si_sdr_") or k.startswith("pesq_"))
                    and isinstance(v, (int, float))
                }
            except Exception:
                pass
            return keep
    except Exception as e:  # pragma: no cover - diagnostics only
        log(f"distill sweep unavailable ({e})")
    return None


def _load_seed_spread(here=None):
    """Multi-seed error bars (VERDICT r4 item 2): mean/min/max/spread of
    every demo quality metric over >=3 training seeds, written by
    scripts/seed_spread.py. File read only — the sweeps are training
    jobs, never run here."""
    out = {}
    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))
    for name, path in (
        ("train", os.path.join(here, "scripts", "train_demo_spread.json")),
        ("distill_log",
         os.path.join(here, "scripts", "distill_demo_log_spread.json")),
    ):
        try:
            with open(path) as f:
                out[name] = json.load(f)
        except Exception:
            pass
    return out or None


def main():
    # Live baseline re-measurement is opt-in; it must run BEFORE this
    # process claims the TPU, hence the subprocess-first dance.
    ref, ref_source = RECORDED_REF, "recorded_r1-r3_max"
    if os.environ.get("_BENCH_REF_CHILD") == "1":
        model, params, mix, _ = build()
        print(f"REF_RESULT {bench_reference_style(model, params, mix):.6f}")
        return
    if os.environ.get("BENCH_RUN_REF") == "1":
        try:
            import subprocess

            env = dict(os.environ, _BENCH_REF_CHILD="1")
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=sys.stderr,
                text=True,
                timeout=int(os.environ.get("BENCH_REF_TIMEOUT", "1200")),
            )
            for line in proc.stdout.splitlines():
                if line.startswith("REF_RESULT "):
                    ref, ref_source = float(line.split()[1]), "measured_live"
            if ref_source == "measured_live" and (
                abs(ref - RECORDED_REF) / RECORDED_REF > 0.10
            ):
                # chip/driver/runtime drift: the recorded constant is stale
                log(
                    f"WARNING: live baseline {ref:.3f} diverges >10% from "
                    f"recorded {RECORDED_REF:.3f} — update RECORDED_REF"
                )
        except Exception as e:
            log(f"reference-style subprocess failed ({e})")
    log(f"baseline: {ref:.3f} utt/s ({ref_source})")

    model, params, mix, mix_ddim = build()
    log(f"params initialized (t={elapsed():.0f}s)")
    fused = bench_fused(model, params, mix)
    log(f"fused: {fused:.3f} utt/s")

    # analytic A100 grounding (BASELINE.md "Analytic A100 bound"):
    # 40 TFLOP/utt at the N=30 operating point; torch reference runs
    # batch-1 fp32 host-stepped. SOL-ish: TF32 @45% util = 1.75 utt/s;
    # realistic eager batch-1: 0.6-1.0 utt/s (midpoint 0.8).
    result = {
        "metric": "wsj0_2mix_separation_throughput_N30",
        "value": round(fused, 4),
        "unit": "utt/sec/chip (5s@8kHz, nf=128, 60 NN evals/utt)",
        "vs_baseline": round(fused / ref, 3),
        "baseline_source": ref_source,
        "vs_a100_sol_est": round(fused / 1.75, 2),
        "vs_a100_realistic_est": round(fused / 0.8, 2),
    }
    sweep = _load_quality_sweep()
    if sweep:
        result["quality_nfe_sweep_demo"] = sweep
    distill = _load_distill_sweep()
    if distill:
        result["quality_distill_demo"] = distill
    spread = _load_seed_spread()
    if spread:
        result["quality_spread"] = spread
    # THE graded line — printed before any optional extras so a budget
    # kill during extras cannot lose the measurement.
    print(json.dumps(result), flush=True)

    # Extras: each gated on a PER-EXTRA remaining-time estimate (VERDICT r4
    # item 1 — a single total-elapsed gate either skipped everything after
    # one cold compile or let a long extra blow the budget).  Estimates are
    # warm-cache wall times measured on this chip; a cold compile inside an
    # extra only costs the LATER extras (the graded line is out already,
    # and every extra re-prints a superset line).
    def run_extra(name, est_s, fn):
        if elapsed() + est_s > BUDGET_S:
            log(f"skipping {name} (t={elapsed():.0f}s + ~{est_s:.0f}s "
                f"> budget {BUDGET_S:.0f}s)")
            return
        try:
            fn()
            print(json.dumps(result), flush=True)  # superset re-print
        except Exception as e:  # extras never take down the graded result
            log(f"{name} extra failed ({e})")

    def _n30_pipelined():
        v = bench_fused_pipelined(model, params, mix)
        log(f"fused pipelined: {v:.3f} utt/s")
        result["N30_pipelined"] = round(v, 4)

    def _ddim6():
        ddim, ddim_p = bench_ddim(model, params, mix_ddim)
        log(f"ddim N=6: {ddim:.3f} utt/s (pipelined {ddim_p:.3f})")
        result["ddim_N6_value"] = round(ddim, 4)
        result["ddim_N6_pipelined"] = round(ddim_p, 4)

    def _ddim2_log():
        # the distilled serving point: DDIM N=2 on the log grid
        ddim2, ddim2_p = bench_ddim(model, params, mix_ddim, N=2,
                                    schedule="log")
        log(f"ddim N=2 (log): {ddim2:.3f} utt/s (pipelined {ddim2_p:.3f})")
        result["ddim_N2_log_value"] = round(ddim2, 4)
        result["ddim_N2_log_pipelined"] = round(ddim2_p, 4)

    run_extra("N30_pipelined", 140, _n30_pipelined)
    run_extra("ddim_N6", 120, _ddim6)
    run_extra("ddim_N2_log", 60, _ddim2_log)


if __name__ == "__main__":
    main()
