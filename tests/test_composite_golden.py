"""Golden-value tests: our composite metrics vs the ACTUAL reference
implementation (/root/reference/evaluate_covl.py) run in-process on fixed
synthetic pairs (VERDICT round-1 weak item 7).

The reference module imports librosa/pesq/tqdm/utils/evaluate_mp at module
scope; none of those are needed by the pure-numpy metric functions
(wss/llr/SSNR/lpcoeff, evaluate_covl.py:62-409), so they are stubbed with
empty modules before import.
"""
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

from diffsep_tpu.models.composite import llr, lpcoeff, ssnr, wss

REF = Path("/root/reference/evaluate_covl.py")


@pytest.fixture(scope="module")
def ref_covl():
    if not REF.exists():
        pytest.skip("reference repo not available")
    saved = {}
    stubs = {}
    for name in ("librosa", "tqdm", "utils", "evaluate_mp"):
        mod = types.ModuleType(name)
        if name == "tqdm":
            mod.tqdm = lambda x, **kw: x
        if name == "evaluate_mp":
            mod.summarize = lambda *a, **k: None
        stubs[name] = mod
    pesq_mod = types.ModuleType("pesq")
    pesq_mod.pesq = lambda *a, **k: float("nan")
    stubs["pesq"] = pesq_mod

    for name, mod in stubs.items():
        saved[name] = sys.modules.get(name)
        sys.modules[name] = mod
    try:
        spec = importlib.util.spec_from_file_location("ref_evaluate_covl", REF)
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
    finally:
        for name, old in saved.items():
            if old is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = old
    return module


@pytest.fixture(scope="module")
def pairs():
    """Fixed synthetic (clean, degraded) pairs at 16 kHz."""
    rng = np.random.default_rng(1234)
    fs = 16000
    t = np.arange(int(1.5 * fs)) / fs
    clean = (
        np.sin(2 * np.pi * 220 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
        + 0.3 * np.sin(2 * np.pi * 850 * t)
        + 0.1 * np.sin(2 * np.pi * 2400 * t)
    ).astype(np.float64)
    out = []
    for snr_db in (20.0, 5.0):
        noise = rng.standard_normal(len(clean))
        noise *= np.sqrt((clean**2).mean() / (noise**2).mean()) * 10 ** (
            -snr_db / 20
        )
        out.append((clean, clean + noise))
    # a filtered (spectrally-tilted) degradation too
    from scipy.signal import lfilter

    out.append((clean, lfilter([1.0], [1.0, -0.7], clean)))
    return fs, out


def test_wss_matches_reference(ref_covl, pairs):
    fs, ps = pairs
    for clean, deg in ps:
        ours = np.asarray(wss(clean, deg, fs), float)
        theirs = np.asarray(ref_covl.wss(clean.copy(), deg.copy(), fs), float)
        n = min(len(ours), len(theirs))
        np.testing.assert_allclose(ours[:n], theirs[:n], rtol=1e-6, atol=1e-8)


def test_llr_matches_reference(ref_covl, pairs):
    fs, ps = pairs
    for clean, deg in ps:
        ours = np.asarray(llr(clean, deg, fs), float).ravel()
        theirs = np.asarray(ref_covl.llr(clean.copy(), deg.copy(), fs), float).ravel()
        n = min(len(ours), len(theirs))
        # atol covers f32 rounding of the near-zero log-ratios; the LPC
        # recursion itself is matched bit-for-bit (see composite.lpcoeff)
        np.testing.assert_allclose(ours[:n], theirs[:n], rtol=1e-5, atol=1e-6)


def test_ssnr_matches_reference(ref_covl, pairs):
    fs, ps = pairs
    for clean, deg in ps:
        snr_o, seg_o = ssnr(clean.copy(), deg.copy(), fs)
        snr_r, seg_r = ref_covl.SSNR(clean.copy(), deg.copy(), fs)
        np.testing.assert_allclose(snr_o, snr_r, rtol=1e-6)
        n = min(len(seg_o), len(seg_r))
        np.testing.assert_allclose(
            np.asarray(seg_o)[:n], np.asarray(seg_r)[:n], rtol=1e-6, atol=1e-8
        )


def test_lpcoeff_matches_reference(ref_covl, pairs):
    _, ps = pairs
    frame = ps[0][0][:320]
    acorr_o, refl_o, lp_o = lpcoeff(frame, 10)
    acorr_r, refl_r, lp_r = ref_covl.lpcoeff(frame, 10)
    np.testing.assert_allclose(lp_o, lp_r, rtol=1e-8)
    np.testing.assert_allclose(refl_o, refl_r, rtol=1e-8)


def test_composite_aggregation_matches_reference(ref_covl, pairs):
    """The alpha=0.95 trimmed means feeding the regressions
    (evaluate_covl.py:23-41) must agree."""
    fs, ps = pairs
    clean, deg = ps[1]
    alpha = 0.95

    w = sorted(np.asarray(wss(clean, deg, fs), float))
    wss_ours = np.mean(w[: int(round(len(w) * alpha))])
    wr = sorted(np.asarray(ref_covl.wss(clean.copy(), deg.copy(), fs), float))
    wss_ref = np.mean(wr[: int(round(len(wr) * alpha))])
    np.testing.assert_allclose(wss_ours, wss_ref, rtol=1e-6)

    l = sorted(np.asarray(llr(clean, deg, fs), float).ravel())
    llr_ours = np.mean(l[: round(len(l) * alpha)])
    lr = sorted(np.asarray(ref_covl.llr(clean.copy(), deg.copy(), fs), float).ravel())
    llr_ref = np.mean(lr[: round(len(lr) * alpha)])
    np.testing.assert_allclose(llr_ours, llr_ref, rtol=1e-6)
