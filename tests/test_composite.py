"""Composite speech-quality metric tests, checked against an independent
transcription of the reference algorithm run in-process (the reference's
own evaluate_covl.py depends on librosa/pesq and cannot be imported)."""
import numpy as np
import pytest

from diffsep_tpu.models.composite import eval_composite, llr, lpcoeff, ssnr, trim_mos, wss


@pytest.fixture
def speechlike(rng):
    fs = 16000
    t = np.arange(fs) / fs
    clean = np.sin(2 * np.pi * 200 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
    clean += 0.3 * np.sin(2 * np.pi * 900 * t)
    noisy = clean + 0.1 * rng.standard_normal(len(t))
    return clean, noisy, fs


def test_trim_mos():
    assert trim_mos(0.3) == 1.0 and trim_mos(7.2) == 5.0 and trim_mos(3.3) == 3.3


def test_lpcoeff_whitens(rng):
    """LPC of an AR(2) process recovers the AR coefficients."""
    n = 4000
    e = rng.standard_normal(n)
    x = np.zeros(n)
    for i in range(2, n):
        x[i] = 0.75 * x[i - 1] - 0.5 * x[i - 2] + e[i]
    _, _, lp = lpcoeff(x, 2)
    np.testing.assert_allclose(lp, [1.0, -0.75, 0.5], atol=0.05)


def test_llr_identity_is_zero(speechlike):
    clean, _, fs = speechlike
    d = llr(clean, clean, fs)
    np.testing.assert_allclose(d, 0.0, atol=1e-6)


def test_llr_increases_with_distortion(speechlike, rng):
    clean, noisy, fs = speechlike
    very_noisy = clean + 1.0 * rng.standard_normal(len(clean))
    assert llr(clean, noisy, fs).mean() < llr(clean, very_noisy, fs).mean()


def test_ssnr_levels(speechlike):
    clean, noisy, fs = speechlike
    overall, seg = ssnr(clean.copy(), clean.copy(), fs)
    assert np.mean(seg) == 35.0  # clipped at the max for identical signals
    overall_n, seg_n = ssnr(clean.copy(), noisy.copy(), fs)
    assert 5 < np.mean(seg_n) < 35


def test_wss_identity_and_ordering(speechlike, rng):
    clean, noisy, fs = speechlike
    d_id = wss(clean, clean, fs)
    np.testing.assert_allclose(d_id, 0.0, atol=1e-8)
    d_lo = wss(clean, noisy, fs).mean()
    very_noisy = clean + 1.0 * rng.standard_normal(len(clean))
    d_hi = wss(clean, very_noisy, fs).mean()
    assert 0 < d_lo < d_hi


def test_eval_composite_structure(speechlike):
    clean, noisy, fs = speechlike
    res = eval_composite(clean, noisy, fs)
    for k in ["csig", "cbak", "covl", "wss", "llr", "ssnr", "pesq"]:
        assert k in res
    # without the optional pesq package the composites are NaN but the raw
    # terms are finite
    assert np.isfinite(res["wss"]) and np.isfinite(res["llr"]) and np.isfinite(res["ssnr"])


def test_composite_formula_with_given_pesq(speechlike):
    clean, noisy, fs = speechlike
    res = eval_composite(clean, noisy, fs, pesq_value=3.0)
    expected_csig = trim_mos(
        3.093 - 1.029 * res["llr"] + 0.603 * 3.0 - 0.009 * res["wss"]
    )
    np.testing.assert_allclose(res["csig"], expected_csig, rtol=1e-6)


def test_eval_composite_pesq_failure_degrades_to_nan():
    """A clip PESQ cannot score (here: too short, <250 ms) must yield NaN
    csig/cbak/covl and finite WSS/LLR/SSNR — not crash the evaluation
    (reference behaviour when the pesq package is absent)."""
    import numpy as np

    from diffsep_tpu.models.composite import eval_composite

    rng = np.random.default_rng(0)
    ref = rng.standard_normal(800).astype(np.float32) * 0.1  # 100 ms @ 8k
    deg = ref + rng.standard_normal(800).astype(np.float32) * 0.01
    out = eval_composite(ref, deg, fs=8000)
    assert np.isnan(out["csig"]) and np.isnan(out["cbak"]) and np.isnan(out["covl"])
    assert np.isfinite(out["wss"]) and np.isfinite(out["llr"])


def test_eval_composite_8k_uses_narrowband_pesq():
    """fs=8000 must take the nb mode (wb raises for 8 kHz) and produce a
    finite pesq on a long-enough clip."""
    import numpy as np

    from diffsep_tpu.models.composite import eval_composite

    rng = np.random.default_rng(1)
    t = np.arange(16000) / 8000
    ref = (np.sin(2 * np.pi * 440 * t) * 0.1).astype(np.float32)
    out = eval_composite(ref, ref + 1e-4 * rng.standard_normal(16000).astype(np.float32), fs=8000)
    assert np.isfinite(out["pesq"])
    assert np.isfinite(out["csig"])
