"""Native PESQ (ITU-T P.862 / P.862.2 structure) — pure numpy.

The reference emits per-utterance `pesq` numbers (reference
evaluate.py:117-124, models/losses.py:40-56) and the noise-reduction
recipe selects checkpoints on val/pesq (reference config/model/nr.yaml).
The GPL `pesq` package is not installable in this build environment, so
this module implements the P.862 pipeline natively:

  level alignment (-> 1e7 target power in the 350-3250 Hz band)
  -> receive-characteristic filter (IRS for nb, 100 Hz high-pass for wb)
  -> time alignment (envelope cross-correlation, single global delay)
  -> perceptual model: Hann frames at 50% overlap -> power spectrum
     -> Bark-band integration -> partial gain/frequency compensation
     -> Zwicker loudness -> masked disturbance + asymmetric disturbance
  -> L6-over-chunks / L2-over-time aggregation
  -> raw = 4.5 - 0.1*d_sym - 0.0309*d_asym
  -> MOS-LQO mapping (P.862.1 nb / P.862.2 wb sigmoids)

Conformance status (kept honest):
  * The MOS mappings, disturbance combination weights, masking rule,
    asymmetry rule, Zwicker exponent, and aggregation norms follow the
    published standard.
  * Frame geometry deviates: 64 ms frames (nfft 512 @ 8 kHz / 1024 @
    16 kHz) instead of P.862's 32 ms, so the L6 chunk=20 window spans
    ~640 ms rather than ~320 ms — halved temporal resolution for
    time-localized degradations (the calibration constants below were
    fitted at this geometry).
  * The Bark band edges and absolute-threshold tables are generated
    analytically (7*asinh(f/650) bark scale; Terhardt threshold curve)
    instead of the ITU reference tables, and utterance-split / bad-frame
    realignment is reduced to one global delay. Scores are exact for
    identical signals (4.549 nb / 4.644 wb, matching the reference
    package) and monotonic/ballpark-correct for degraded speech, but NOT
    bit-conformant to the ITU implementation. When the `pesq` package is
    installed it takes precedence automatically (see `get_pesq`).

Use `get_pesq()` everywhere instead of importing the package directly.
"""
from __future__ import annotations

import numpy as np

__all__ = ["pesq", "get_pesq", "NativePesqError"]


class NativePesqError(ValueError):
    pass


# --------------------------------------------------------------------------
# configuration per sample rate
# --------------------------------------------------------------------------

_CFG = {
    8000: dict(nfft=512, downsample=32, n_bark=42),
    16000: dict(nfft=1024, downsample=64, n_bark=49),
}

_TARGET_POWER = 1e7

# calibration constants (identity-invariant): absolute threshold at 1 kHz
# in band-density units, the Zwicker loudness scale, and the asymmetric
# frame-disturbance cap. Fitted so the white-noise-on-speech SNR->MOS
# curve lands on typical published PESQ behavior
# (40dB->4.57, 30->4.28, 20->2.52, 10->1.73, 0->1.52; targets ~4.1/3.6/
# 2.8/2.1/1.45); re-fit against the reference implementation when egress
# exists. See tests/test_pesq_native.py.
_P0_1K = 0.1
_SL = 1.5
_ASYM_CAP = 90.0

# IRS receive characteristic (frequency Hz, gain dB) — telephone-band
# weighting applied in narrowband mode (P.862 standard IRS filter shape)
_IRS_DB = np.array([
    (0, -200.0), (50, -40.0), (100, -20.0), (125, -12.0), (160, -6.0),
    (200, 0.0), (250, 4.0), (300, 6.0), (350, 8.0), (400, 10.0),
    (500, 11.0), (600, 12.0), (700, 12.0), (800, 12.0), (1000, 12.0),
    (1300, 12.0), (1600, 12.0), (2000, 12.0), (2500, 12.0), (3000, 12.0),
    (3250, 12.0), (3500, 4.0), (4000, -200.0), (8000, -200.0),
])


def _bark(f):
    return 7.0 * np.arcsinh(np.asarray(f, np.float64) / 650.0)


def _abs_threshold_db(f_hz):
    """Terhardt absolute hearing threshold (dB SPL-like), clipped."""
    f = np.maximum(np.asarray(f_hz, np.float64), 20.0) / 1000.0
    thr = (
        3.64 * f**-0.8
        - 6.5 * np.exp(-0.6 * (f - 3.3) ** 2)
        + 1e-3 * f**4
    )
    return np.clip(thr, -10.0, 100.0)


def _band_partition(fs, nfft, n_bark):
    """Assign rFFT bins (excluding DC) to n_bark contiguous bands uniform
    on the bark axis; guarantees every band holds >= 1 bin."""
    freqs = np.fft.rfftfreq(nfft, 1.0 / fs)[1:]
    z = _bark(freqs)
    edges = np.linspace(0.0, float(z[-1]) + 1e-9, n_bark + 1)
    idx = np.clip(np.searchsorted(edges, z, side="right") - 1, 0, n_bark - 1)
    # guarantee non-empty bands: walk once, folding empties downward
    counts = np.bincount(idx, minlength=n_bark)
    if (counts == 0).any():
        # re-partition by splitting the bin list into n_bark runs of at
        # least one bin, proportional to bark coverage
        cum = (z - z[0]) / (z[-1] - z[0] + 1e-12)
        idx = np.minimum((cum * n_bark).astype(int), n_bark - 1)
        # make monotone starts unique
        for b in range(1, n_bark):
            if not (idx == b).any():
                first = np.searchsorted(idx, b)
                if first >= len(idx):
                    first = len(idx) - 1
                idx[first] = b
        idx = np.maximum.accumulate(idx)
    centers_hz = np.array(
        [freqs[idx == b].mean() for b in range(n_bark)]
    )
    widths_bark = np.array(
        [
            max(_bark(freqs[idx == b].max()) - _bark(freqs[idx == b].min()), 1e-3)
            if (idx == b).sum() > 1
            else edges[b + 1] - edges[b]
            for b in range(n_bark)
        ]
    )
    return idx, centers_hz, widths_bark


def _level_align(x, fs):
    """Scale so the 350-3250 Hz band power equals the P.862 target."""
    spec = np.fft.rfft(x)
    freqs = np.fft.rfftfreq(len(x), 1.0 / fs)
    band = (freqs >= 350) & (freqs <= 3250)
    # Parseval: band energy -> mean band power per sample
    p = (np.abs(spec[band]) ** 2).sum() * 2.0 / (len(x) ** 2)
    if p <= 0:
        raise NativePesqError("silent input signal")
    return x * np.sqrt(_TARGET_POWER / (p * len(x)))


def _apply_fft_filter(x, fs, curve_hz, curve_db):
    spec = np.fft.rfft(x)
    freqs = np.fft.rfftfreq(len(x), 1.0 / fs)
    gain_db = np.interp(freqs, curve_hz, curve_db)
    spec *= 10.0 ** (gain_db / 20.0)
    return np.fft.irfft(spec, n=len(x))


def _input_filter(x, fs, mode):
    if mode == "nb":
        return _apply_fft_filter(x, fs, _IRS_DB[:, 0], _IRS_DB[:, 1])
    # wb: 100 Hz high-pass roll-off (P.862.2 input filter intent)
    return _apply_fft_filter(
        x, fs,
        np.array([0.0, 50.0, 100.0, fs / 2]),
        np.array([-200.0, -20.0, 0.0, 0.0]),
    )


def _global_delay(ref, deg, downsample):
    """Crude alignment: cross-correlate block-energy envelopes."""
    def env(x):
        n = len(x) // downsample
        e = np.abs(x[: n * downsample]).reshape(n, downsample).sum(axis=1)
        return np.log(e + 1e-10)

    a, b = env(ref), env(deg)
    n = 1 << int(np.ceil(np.log2(len(a) + len(b))))
    corr = np.fft.irfft(
        np.fft.rfft(b - b.mean(), n) * np.conj(np.fft.rfft(a - a.mean(), n)), n
    )
    lags = np.arange(n)
    lags[lags > n // 2] -= n
    best = int(lags[np.argmax(corr)])
    return best * downsample  # deg is delayed by this many samples


def _frames(x, nfft):
    hop = nfft // 2
    n = max((len(x) - nfft) // hop + 1, 0)
    if n == 0:
        return np.zeros((0, nfft))
    idx = np.arange(nfft)[None, :] + hop * np.arange(n)[:, None]
    return x[idx]


def pesq(fs: int, ref, deg, mode: str = "wb") -> float:
    """MOS-LQO, signature-compatible with `pesq.pesq` from the package."""
    if mode not in ("nb", "wb"):
        raise NativePesqError(f"mode must be 'nb' or 'wb', got {mode!r}")
    if fs not in _CFG:
        raise NativePesqError(f"fs must be 8000 or 16000, got {fs}")
    if mode == "wb" and fs != 16000:
        raise NativePesqError("wideband PESQ requires fs=16000")

    ref = np.asarray(ref, np.float64).reshape(-1)
    deg = np.asarray(deg, np.float64).reshape(-1)
    n = min(len(ref), len(deg))
    if n < fs // 4:
        raise NativePesqError("signals too short for PESQ (<250 ms)")
    ref, deg = ref[:n].copy(), deg[:n].copy()

    cfg = _CFG[fs]
    nfft, n_bark = cfg["nfft"], cfg["n_bark"]

    ref = _level_align(ref, fs)
    deg = _level_align(deg, fs)
    ref = _input_filter(ref, fs, mode)
    deg = _input_filter(deg, fs, mode)

    # single global time alignment (utterance splitting not implemented)
    delay = _global_delay(ref, deg, cfg["downsample"])
    if delay > 0:
        deg = deg[delay:]
    elif delay < 0:
        ref = ref[-delay:]
    n = min(len(ref), len(deg))
    ref, deg = ref[:n], deg[:n]

    band_idx, centers_hz, widths = _band_partition(fs, nfft, n_bark)
    win = np.hanning(nfft)

    fr = _frames(ref, nfft) * win
    fd = _frames(deg, nfft) * win
    if fr.shape[0] < 2:
        raise NativePesqError("signals too short after alignment")

    # power spectra (exclude DC) -> bark band powers
    pr = np.abs(np.fft.rfft(fr, axis=1))[:, 1:] ** 2
    pd = np.abs(np.fft.rfft(fd, axis=1))[:, 1:] ** 2
    nb = n_bark
    br = np.zeros((pr.shape[0], nb))
    bd = np.zeros((pd.shape[0], nb))
    for b in range(nb):
        m = band_idx == b
        br[:, b] = pr[:, m].sum(axis=1)
        bd[:, b] = pd[:, m].sum(axis=1)
    # normalize to density-like scale so thresholds are comparable across
    # band widths
    scale = 1.0 / (widths * nfft)
    br *= scale
    bd *= scale

    # anchor to P.862 working units: the standard's absolute constants
    # (+50 asymmetry floor, +1e5 frame weighting, 1e7 level target) assume
    # active-speech frame power ~ 1e7. Self-calibrate from the reference
    # so every constant below operates in its intended regime.
    tot0 = br.sum(axis=1)
    act0 = tot0 > tot0.max() * 1e-3 + 1e-12
    c = _TARGET_POWER / max(float(tot0[act0].mean()), 1e-12)
    br *= c
    bd *= c

    # absolute threshold per band: Terhardt curve anchored at _P0_1K at
    # 1 kHz (calibrated, see module docstring)
    thr_db = _abs_threshold_db(centers_hz)
    p0 = 10.0 ** ((thr_db - _abs_threshold_db(1000.0)) / 10.0) * _P0_1K

    # speech-active frames: audible reference power above threshold
    tot_r = br.sum(axis=1)
    active = tot_r > (tot_r.max() * 1e-3 + 1e-12)
    if not active.any():
        active = np.ones(len(tot_r), bool)

    # partial frequency (gain) compensation of the degraded spectrum
    mean_r = br[active].mean(axis=0)
    mean_d = bd[active].mean(axis=0)
    bd_eq = bd * np.clip(
        (mean_r + 1000.0) / (mean_d + 1000.0), 10 ** (-2.0), 10 ** (2.0)
    )

    # per-frame gain compensation (first-order smoothed, clipped). The
    # gain is a SPEECH gain estimate: it only updates while the reference
    # is active and holds through pauses — otherwise it would track the
    # degraded signal's noise floor down and cancel exactly the
    # added-noise-in-silence disturbance PESQ is designed to punish.
    ratio = (br.sum(axis=1) + 5e3) / (bd_eq.sum(axis=1) + 5e3)
    g = np.empty_like(ratio)
    acc = 1.0
    for i, r in enumerate(ratio):
        if active[i]:
            acc = 0.8 * acc + 0.2 * np.clip(r, 3e-4, 5.0)
        g[i] = np.clip(acc, 3e-4, 5.0)
    bd_eq = bd_eq * g[:, None]

    # Zwicker loudness
    def loudness(p):
        sl = _SL  # loudness scale (identity-invariant; calibrated)
        base = (p0 / 0.5) ** 0.23
        ratio = (0.5 + 0.5 * p / p0) ** 0.23 - 1.0
        s = sl * base * ratio
        return np.where(p > p0, s, 0.0)

    lr = loudness(br)
    ld = loudness(bd_eq)

    # masked disturbance
    d = ld - lr
    m = 0.25 * np.minimum(lr, ld)
    dist = np.sign(d) * np.maximum(np.abs(d) - m, 0.0)

    # asymmetry factor per band/frame
    h = ((bd_eq + 50.0) / (br + 50.0)) ** 1.2
    h = np.where(h < 3.0, 0.0, np.minimum(h, 12.0))

    w = widths / widths.sum()
    frame_sym = np.sqrt((w * dist**2).sum(axis=1))
    frame_asym = (w * np.abs(dist) * h).sum(axis=1)

    # weight frames by audible reference power, clip spikes
    fw = ((tot_r + 1e5) / 1e7) ** 0.04
    frame_sym = np.minimum(frame_sym / fw, 45.0)
    frame_asym = np.minimum(frame_asym / fw, _ASYM_CAP)

    def aggregate(fd_, chunk=20):
        # L6 inside ~320 ms windows, L2 across windows (P.862 time norms)
        n = len(fd_)
        if n == 0:
            return 0.0
        pad = (-n) % chunk
        x = np.pad(fd_, (0, pad))
        blocks = x.reshape(-1, chunk)
        l6 = ((blocks**6).mean(axis=1)) ** (1 / 6)
        return float(np.sqrt((l6**2).mean()))

    d_sym = aggregate(frame_sym)
    d_asym = aggregate(frame_asym)

    raw = 4.5 - 0.1 * d_sym - 0.0309 * d_asym

    if mode == "nb":
        mos = 0.999 + 4.0 / (1.0 + np.exp(-1.4945 * raw + 4.6607))
    else:
        mos = 0.999 + 4.0 / (1.0 + np.exp(-1.3669 * raw + 3.8224))
    return float(np.clip(mos, 1.0, 4.999))


def get_pesq():
    """The PESQ callable to use: the reference GPL `pesq` package when
    installed (bit-conformant), else this module's native implementation."""
    try:
        from pesq import pesq as _pkg_pesq  # type: ignore

        return _pkg_pesq
    except ImportError:
        return pesq
