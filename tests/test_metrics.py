"""Metric tests: SI-BSS eval decomposition properties and STOI sanity."""
import numpy as np
import pytest

import jax.numpy as jnp

from diffsep_tpu.models.losses import SISDRLoss, si_sdr, si_sdr_pit
from diffsep_tpu.models.metrics import si_bss_eval_sources, stoi


def _sources(rng, n=2, T=4000):
    return rng.standard_normal((1, n, T)).astype(np.float64)


def test_si_sdr_perfect_estimate(rng):
    ref = _sources(rng)
    sdr, sir, sar, perm = si_bss_eval_sources(ref, ref * 3.0, clamp_db=100)
    # scale-invariance: scaled copy has max SDR (hits clamp)
    assert (sdr >= 99.0).all()
    np.testing.assert_array_equal(perm[0], [0, 1])


def test_si_sdr_permuted_estimate(rng):
    ref = _sources(rng)
    est = ref[:, ::-1, :].copy()
    sdr, _, _, perm = si_bss_eval_sources(ref, est, clamp_db=100)
    np.testing.assert_array_equal(perm[0], [1, 0])
    assert (sdr >= 99.0).all()


def test_si_sdr_known_value(rng):
    """SDR of ref + noise at a controlled level ~= expected SNR."""
    ref = _sources(rng, n=2)
    noise = rng.standard_normal(ref.shape)
    # scale noise for 10 dB per source
    for i in range(2):
        noise[0, i] *= np.linalg.norm(ref[0, i]) / np.linalg.norm(noise[0, i]) / np.sqrt(10)
    est = ref + noise
    sdr, sir, sar, _ = si_bss_eval_sources(ref, est)
    np.testing.assert_allclose(sdr[0], 10.0, atol=0.8)
    # interference (other source) is only part of the noise -> SIR > SDR
    assert (sir[0] > sdr[0]).all()


def test_sir_pure_interference(rng):
    """est = ref + scaled other source: artifact-free, so SAR is huge and
    SIR matches the injected interference level."""
    ref = _sources(rng)
    est = ref.copy()
    est[0, 0] += 0.1 * ref[0, 1]
    sdr, sir, sar, _ = si_bss_eval_sources(ref, est, clamp_db=100)
    assert sar[0, 0] >= 99.0  # no artifacts
    np.testing.assert_allclose(sir[0, 0], 20.0, atol=1.0)  # 0.1 -> 20 dB


def test_si_sdr_loss_module(rng):
    ref = jnp.asarray(_sources(rng).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal(ref.shape).astype(np.float32))
    est = ref + 0.1 * noise
    loss = SISDRLoss(zero_mean=True, clamp_db=30, reduction="mean", sign_flip=True)
    v = float(loss(est, ref))
    assert 15 < v <= 30
    # permuted estimate gives the same PIT value
    v2 = float(loss(est[:, ::-1, :], ref))
    np.testing.assert_allclose(v, v2, rtol=1e-4)


def test_si_sdr_pit_vs_bss_eval(rng):
    """The jax PIT SI-SDR and the numpy bss-eval SDR agree on aligned
    estimates."""
    ref = _sources(rng)
    est = ref + 0.05 * rng.standard_normal(ref.shape)
    vals = np.asarray(si_sdr_pit(jnp.asarray(est), jnp.asarray(ref)))
    sdr, *_ = si_bss_eval_sources(ref, est)
    np.testing.assert_allclose(vals[0], sdr[0], atol=0.1)


def test_stoi_clean_vs_noisy(rng):
    fs = 8000
    t = np.arange(fs * 2) / fs
    # speech-like: sum of AM-modulated tones
    clean = np.sin(2 * np.pi * 220 * t) * (1 + np.sin(2 * np.pi * 4 * t))
    clean += 0.5 * np.sin(2 * np.pi * 800 * t) * (1 + np.sin(2 * np.pi * 7 * t))
    noisy = clean + 2.0 * rng.standard_normal(len(t))
    s_clean = stoi(clean, clean, fs)
    s_noisy = stoi(clean, noisy, fs)
    assert s_clean > 0.99
    assert s_noisy < s_clean
    e_clean = stoi(clean, clean, fs, extended=True)
    e_noisy = stoi(clean, noisy, fs, extended=True)
    # identity must score exactly 1.0: the doubly-normalized segment product
    # sums to N and the 2016 paper divides by N (a /J normalization scores 2)
    np.testing.assert_allclose(e_clean, 1.0, atol=1e-9)
    assert e_noisy < e_clean


def _stoi_independent(x, y, extended=False):
    """Independent loop-based transcription of STOI (Taal et al. 2011) at
    fs=10 kHz, written from the published algorithm (256-sample Hann frames
    at 50% overlap, 40 dB silent-frame removal, 512-pt FFT, 15 one-third
    octave bands from 150 Hz, 30-frame segments, -15 dB SDR clip) — the
    same role test_composite_golden plays for WSS/LLR: a second, separate
    derivation that pins metrics.stoi beyond monotonicity."""
    N_FR, HOP, NFFT, J, N = 256, 128, 512, 15, 30
    w = np.hanning(N_FR + 2)[1:-1]
    nf = (len(x) - N_FR) // HOP + 1
    xw = np.array([x[i * HOP:i * HOP + N_FR] * w for i in range(nf)])
    yw = np.array([y[i * HOP:i * HOP + N_FR] * w for i in range(nf)])
    e = 20 * np.log10(np.sqrt((xw**2).sum(1)) + 1e-10)
    keep = e > e.max() - 40.0
    xw, yw = xw[keep], yw[keep]
    xs = np.zeros((len(xw) - 1) * HOP + N_FR)
    ys = np.zeros_like(xs)
    for i in range(len(xw)):
        xs[i * HOP:i * HOP + N_FR] += xw[i]
        ys[i * HOP:i * HOP + N_FR] += yw[i]
    f = np.arange(NFFT // 2 + 1) * 10000.0 / NFFT
    nf2 = (len(xs) - N_FR) // HOP + 1
    sx = np.array([np.fft.rfft(xs[i * HOP:i * HOP + N_FR] * w, NFFT)
                   for i in range(nf2)])
    sy = np.array([np.fft.rfft(ys[i * HOP:i * HOP + N_FR] * w, NFFT)
                   for i in range(nf2)])
    X, Y = [], []
    for j in range(J):
        cf = 150.0 * 2 ** (j / 3.0)
        lo = np.argmin((f - cf * 2 ** (-1 / 6)) ** 2)
        hi = np.argmin((f - cf * 2 ** (1 / 6)) ** 2)
        X.append(np.sqrt((np.abs(sx[:, lo:hi]) ** 2).sum(1) + 1e-10))
        Y.append(np.sqrt((np.abs(sy[:, lo:hi]) ** 2).sum(1) + 1e-10))
    X, Y = np.array(X), np.array(Y)
    vals = []
    for m in range(N, X.shape[1] + 1):
        Xs, Ys = X[:, m - N:m], Y[:, m - N:m]
        if extended:
            def rn(A):
                A = A - A.mean(1, keepdims=True)
                return A / (np.linalg.norm(A, axis=1, keepdims=True) + 1e-10)

            def cn(A):
                A = A - A.mean(0, keepdims=True)
                return A / (np.linalg.norm(A, axis=0, keepdims=True) + 1e-10)

            vals.append(np.sum(cn(rn(Xs)) * cn(rn(Ys))) / N)
        else:
            d = 0.0
            for j in range(J):
                a = np.linalg.norm(Xs[j]) / (np.linalg.norm(Ys[j]) + 1e-10)
                yc = np.minimum(Ys[j] * a, Xs[j] * (1 + 10 ** (15 / 20)))
                xm, ym = Xs[j] - Xs[j].mean(), yc - yc.mean()
                d += (xm @ ym) / (np.linalg.norm(xm) * np.linalg.norm(ym) + 1e-10)
            vals.append(d / J)
    return float(np.mean(vals))


def test_stoi_golden_anchors():
    """metrics.stoi vs an independent transcription AND pinned literals on
    fixed vectors, so the implementation is anchored by actual values, not
    just monotonicity (same epistemic upgrade test_composite_golden gave
    WSS/LLR)."""
    rng = np.random.default_rng(1234)
    fs = 10000  # native STOI rate: no resampling in the comparison path
    t = np.arange(fs) / fs
    clean = (
        np.sin(2 * np.pi * 300 * t) * (1 + 0.8 * np.sin(2 * np.pi * 5 * t))
        + 0.4 * np.sin(2 * np.pi * 1200 * t) * (1 + np.sin(2 * np.pi * 3 * t))
    )
    noise = rng.standard_normal(len(t))
    scale = np.linalg.norm(clean) / np.linalg.norm(noise)
    cases = {
        "snr0": clean + noise * scale,
        "snr10": clean + 10 ** (-0.5) * noise * scale,
        "lowpass": np.convolve(clean, np.ones(8) / 8, mode="same"),
    }
    # literals computed once from the independent transcription (seed 1234)
    # Extended values are the standard-to-2016-paper (1/N)-normalized ones;
    # the pre-fix literals divided by J=15 instead of N=30 (exactly 2x).
    golden = {
        "snr0": (0.3130374903, 0.3030275653 / 2),
        "snr10": (0.3405642626, 0.3297908729 / 2),
        "lowpass": (0.7936730930, 0.9449219590 / 2),
    }
    for name, deg in cases.items():
        g_std, g_ext = golden[name]
        np.testing.assert_allclose(stoi(clean, deg, fs), g_std, atol=1e-9)
        np.testing.assert_allclose(
            stoi(clean, deg, fs, extended=True), g_ext, atol=1e-9
        )
        np.testing.assert_allclose(
            _stoi_independent(clean, deg), g_std, atol=1e-9
        )
        np.testing.assert_allclose(
            _stoi_independent(clean, deg, extended=True), g_ext, atol=1e-9
        )


def test_pesq_module_shape_validation(rng):
    """(batch, samples) input must raise loudly — [i, 0] indexing on 2-D
    arrays yields scalars and PESQ then fails with a confusing message."""
    import pytest

    from diffsep_tpu.models.losses import PESQ

    m = PESQ(mode="nb", fs=8000, max_items=1)
    x3 = rng.standard_normal((1, 1, 8000)).astype("float32")
    with pytest.raises(ValueError, match="channels"):
        m(x3[:, 0], x3[:, 0])
    # the 3-D contract works (native P.862-style backend)
    val = m(x3, x3)
    assert val == val  # finite, not NaN


# ===========================================================================
# Hand-computed anchors (VERDICT r3 item 4)
# ===========================================================================
#
# The round-3 ESTOI incident (value exactly 2x, shared by the implementation
# AND the test's independent transcription of the same paper equations)
# showed transcription-based goldens can carry correlated errors.  The
# anchors below are derived by HAND ARITHMETIC on tiny inputs — every
# intermediate quantity is written out in the comments, so their derivation
# shares no structure (and no constants) with models/metrics.py.


def test_si_bss_hand_anchor_orthogonal_refs():
    """2 orthogonal references, estimates with known decompositions.

    refs: s1 = [1,1,0,0], s2 = [0,0,1,1]  (orthogonal, ||s||^2 = 2)
    est1 = [1, .5, .5, 0] = 0.75*s1 + 0.25*s2 + a,  a = [.25,-.25,.25,-.25]
      (a is orthogonal to both refs: <a,s1> = .25-.25 = 0, <a,s2> = 0)
      s_target  = <est1,s1>/||s1||^2 * s1 = (1.5/2) s1,  ||.||^2 = 0.5625*2
                = 1.125
      P_span    = 0.75 s1 + 0.25 s2, ||.||^2 = 0.5625*2 + 0.0625*2 = 1.25
      e_interf  = 0.25 s2,           ||.||^2 = 0.125
      e_artif   = a,                 ||.||^2 = 4*(1/16)  = 0.25
      ||est1||^2 = 1 + .25 + .25 = 1.5
      SDR = 1.125/(1.5-1.125) = 3    -> 10 log10 3 = 4.7712125 dB
      SIR = 1.125/0.125       = 9    -> 10 log10 9 = 9.5424251 dB
      SAR = 1.25/0.25         = 5    -> 10 log10 5 = 6.9897000 dB
    est2 = [0, .5, .5, 1] is the mirror image (swap s1 <-> s2), so the
    same three numbers; the permutation is identity (cross-pairing scores
    s_target = <est1,s2>^2/2 = 0.125 -> SDR = 0.125/1.375 << 3)."""
    from diffsep_tpu.models.metrics import si_bss_eval_sources

    ref = np.array([[[1, 1, 0, 0], [0, 0, 1, 1]]], np.float64)
    est = np.array([[[1, 0.5, 0.5, 0], [0, 0.5, 0.5, 1]]], np.float64)
    sdr, sir, sar, perm = si_bss_eval_sources(ref, est)
    np.testing.assert_allclose(perm, [[0, 1]])
    np.testing.assert_allclose(sdr[0], 10 * np.log10(3.0), atol=1e-7)
    np.testing.assert_allclose(sir[0], 10 * np.log10(9.0), atol=1e-6)
    np.testing.assert_allclose(sar[0], 10 * np.log10(5.0), atol=1e-6)


def test_si_sdr_hand_anchor_zero_db():
    """Le Roux et al. 2019 SI-SDR, single source:
    s = [1,1,0,0], s_hat = [1,0,0,0]:
      alpha     = <s_hat,s>/||s||^2 = 1/2
      e_target  = [.5,.5,0,0],  ||.||^2 = 0.5
      e_res     = [.5,-.5,0,0], ||.||^2 = 0.5
      SI-SDR    = 10 log10(0.5/0.5) = 0 dB exactly."""
    from diffsep_tpu.models.metrics import si_bss_eval_sources

    ref = np.array([[[1, 1, 0, 0]]], np.float64)
    est = np.array([[[1, 0, 0, 0]]], np.float64)
    sdr, _, _, _ = si_bss_eval_sources(ref, est)
    np.testing.assert_allclose(sdr[0, 0], 0.0, atol=1e-7)


def test_estoi_stage_hand_anchors():
    """The ESTOI segment stage on J=2 bands — after row normalization the
    two column entries are (a_n, b_n); column centering gives
    +-(a_n-b_n)/2 and column normalization maps them to +-1/sqrt(2) with
    the sign of (a_n - b_n).  Each column's inner product is therefore
    exactly +1 (same sign pattern), -1 (opposite), or 0 (a tie in either
    input), and d = (sum over columns)/N.  With N=4 time columns and J=2
    bands any J/N normalization mix-up (the round-3 bug class) shifts
    these anchors by a factor 2.

    X rows: x1 = [0,1,2,3] -> centered [-1.5,-.5,.5,1.5]/sqrt(5),
            x2 = [3,2,1,0] -> the negation, so sign(x1-x2) = (-,-,+,+).
    Y = X                  -> every column agrees      -> d = +1.
    Y = X with bands swapped -> every column disagrees -> d = -1.
    Y rows: y1 = x1, y2 = [2,0,1,3] -> centered [.5,-1.5,-.5,1.5]/sqrt(5);
            sign(y1-y2): n1: -1.5-0.5 <0 -> -;  n2: -.5+1.5 >0 -> +;
                         n3: .5+.5   >0 -> +;  n4: 1.5-1.5  =0 -> tie.
            vs X (-,-,+,+): col1 agree (+1), col2 disagree (-1),
            col3 agree (+1), col4 zero -> d = (1-1+1+0)/4 = 1/4."""
    from diffsep_tpu.models.metrics import _estoi_segment_d

    x1 = [0.0, 1.0, 2.0, 3.0]
    X = np.array([x1, x1[::-1]])[:, None, :]  # (2 bands, 1 seg, 4)
    np.testing.assert_allclose(_estoi_segment_d(X, X), [1.0], atol=1e-9)
    np.testing.assert_allclose(
        _estoi_segment_d(X, X[::-1]), [-1.0], atol=1e-9
    )
    Y = np.array([x1, [2.0, 0.0, 1.0, 3.0]])[:, None, :]
    np.testing.assert_allclose(_estoi_segment_d(X, Y), [0.25], atol=1e-7)


def test_stoi_stage_hand_anchor_with_clip():
    """The standard-STOI segment stage, J=1 band, N=4, with the beta-clip
    active at exactly one sample:
      x = [0,1,2,3], y = [3,2,1,0]
      alpha = ||x||/||y|| = sqrt(14)/sqrt(14) = 1
      clip bound = x * (1 + 10^(15/20)) = 6.6234*x -> bound at n1 is 0
      y_clipped = [min(3,0), min(2,6.62), min(1,13.2), min(0,19.9)]
                = [0,2,1,0]
      corr(x, yc): x centered [-1.5,-.5,.5,1.5]; yc mean 3/4,
      centered [-3/4, 5/4, 1/4, -3/4]
      dot = 9/8 - 5/8 + 1/8 - 9/8 = -1/2
      norms: sqrt(5) * sqrt(9/16+25/16+1/16+9/16) = sqrt(5)*sqrt(44/16)
           = sqrt(55)/2
      d = (-1/2)/(sqrt(55)/2) = -1/sqrt(55)."""
    from diffsep_tpu.models.metrics import _stoi_segment_d

    X = np.array([[0.0, 1.0, 2.0, 3.0]])[:, None, :]
    Y = np.array([[3.0, 2.0, 1.0, 0.0]])[:, None, :]
    np.testing.assert_allclose(
        _stoi_segment_d(X, Y), [-1.0 / np.sqrt(55.0)], atol=1e-9
    )


def test_stoi_polarity_invariance_full_pipeline():
    """Full-pipeline anchor requiring no transcription at all: STOI and
    ESTOI operate on magnitude band envelopes, so est = -ref must score
    exactly what est = ref scores (1.0)."""
    from diffsep_tpu.models.metrics import stoi

    rng = np.random.default_rng(11)
    x = rng.standard_normal(4 * 8000) * 0.2
    for ext in (False, True):
        assert abs(stoi(x, -x, 8000, extended=ext) - 1.0) < 1e-9
