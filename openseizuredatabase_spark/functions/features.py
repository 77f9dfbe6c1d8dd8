"""Epoch feature extraction (reference W5/W8/W9, C13/C14, A10).

The reference's extractFeatures stage (user_tools/nnTraining2/
extractFeatures.py:143-211, accelFeatures.py:60-158) concatenates an
event's samples, interpolates sparse HR/O2 onto the 25 Hz timebase,
slides overlapping epochs and computes ~150 features per epoch, fanned
out over a multiprocessing pool. Here the same math runs as a per-event
``applyInPandas`` stage — executor parallelism replaces the pool, and the
feature vector is emitted as a map column (stable schema at any feature
count).

scipy is not available in this environment, so the Butterworth filter
(C13) and Welch PSD (C14) are implemented in numpy with the same
formulas scipy uses (bilinear-transform Butterworth design; single-
segment Hann-windowed density-scaled Welch, matching the reference's
``welch(..., nperseg=None, window=hann(len(x)))`` call which degenerates
to one periodogram). Gated: if scipy appears, it is used directly.
"""

from __future__ import annotations

import math
from typing import Iterator, Mapping

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

try:  # pragma: no cover - scipy absent in this environment
    from scipy import signal as _scipy_signal

    _HAS_SCIPY = True
except ImportError:
    _HAS_SCIPY = False

# 14 named bands (extractFeatures.py:162-178)
FREQ_BANDS: Mapping[str, tuple[float, float]] = {
    "osdRoi": (3.0, 8.0),
    "osdSpec": (0.5, 12.5),
    "osdFlap": (2.0, 4.0),
    "seizure_main": (1.0, 4.0),
    "initial_clonus": (3.0, 5.0),
    "late_clonus": (1.0, 2.0),
    "1-3Hz": (1.0, 3.0),
    "2-4Hz": (2.0, 4.0),
    "3-5Hz": (3.0, 5.0),
    "4-6Hz": (4.0, 6.0),
    "5-7Hz": (5.0, 7.0),
    "6-8Hz": (6.0, 8.0),
    "7-9Hz": (7.0, 9.0),
    "8-10Hz": (8.0, 10.0),
}


# --- numpy DSP primitives --------------------------------------------------


def hann(n: int) -> np.ndarray:
    if n == 1:
        return np.ones(1)
    i = np.arange(n)
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * i / (n - 1)))


def welch_psd(x: np.ndarray, fs: float) -> tuple[np.ndarray, np.ndarray]:
    """Single-segment Hann Welch PSD, scaling='density', constant detrend.

    Matches scipy.signal.welch(x, fs, nperseg=None, window=hann(len(x)))
    — the reference's exact call (accelFeatures.py:86).
    """
    if _HAS_SCIPY:  # pragma: no cover
        return _scipy_signal.welch(
            x, fs=fs, window=hann(len(x)), nperseg=None, scaling="density"
        )
    n = len(x)
    win = hann(n)
    xd = x - x.mean()
    spec = np.fft.rfft(xd * win)
    scale = 1.0 / (fs * np.sum(win**2))
    psd = scale * np.abs(spec) ** 2
    if n % 2 == 0:
        psd[1:-1] *= 2.0
    else:
        psd[1:] *= 2.0
    freqs = np.fft.rfftfreq(n, 1.0 / fs)
    return freqs, psd


def butter_coeffs(order: int, wn: float, btype: str = "low") -> tuple[np.ndarray, np.ndarray]:
    """Digital Butterworth (b, a) via analog prototype + bilinear
    transform — the same construction scipy.signal.butter performs."""
    if _HAS_SCIPY:  # pragma: no cover
        return _scipy_signal.butter(order, wn, btype=btype)
    # analog prototype poles p_k = exp(iπ(2k+n+1)/(2n)) — all strictly in
    # the left half-plane (the -exp(iπ(2k+1)/(2n)) form flips half of
    # them to the right half-plane and yields an unstable filter)
    k = np.arange(order)
    poles = np.exp(1j * np.pi * (2 * k + order + 1) / (2 * order))
    warped = 4.0 * np.tan(np.pi * wn / 2.0)  # pre-warp: 2*fs*tan(πWn/fs), fs=2
    if btype == "low":
        poles = poles * warped
        zeros = np.array([])
        gain = warped**order
    elif btype == "high":
        poles = warped / poles
        zeros = np.zeros(order)
        gain = 1.0
    else:
        raise ValueError(f"unsupported btype {btype!r}")
    # bilinear transform (fs = 2)
    fs2 = 4.0
    z_poles = (fs2 + poles) / (fs2 - poles)
    z_zeros = (fs2 + zeros) / (fs2 - zeros) if len(zeros) else np.array([])
    # lowpass gains n extra zeros at z=-1; highpass keeps mapped zeros
    z_zeros = np.concatenate([z_zeros, -np.ones(order - len(z_zeros))])
    gain = gain * np.real(np.prod(fs2 - zeros) / np.prod(fs2 - poles))
    b = np.real(np.poly(z_zeros)) * gain
    a = np.real(np.poly(z_poles))
    # normalize passband gain exactly (DC for low, Nyquist for high)
    ref = 1.0 if btype == "low" else -1.0
    resp = np.polyval(b, ref) / np.polyval(a, ref)
    b = b / resp
    return b, a


def _lfilter(
    b: np.ndarray, a: np.ndarray, x: np.ndarray, zi: np.ndarray | None = None
) -> np.ndarray:
    """Direct-form II transposed IIR filter, optionally seeded with
    initial state ``zi`` (scipy.signal.lfilter's zi parameter)."""
    b = b / a[0]
    a = a / a[0]
    n_state = max(len(a), len(b)) - 1
    z = np.zeros(n_state) if zi is None else np.asarray(zi, dtype=float).copy()
    y = np.empty_like(x, dtype=float)
    bb = np.concatenate([b, np.zeros(n_state + 1 - len(b))])
    aa = np.concatenate([a, np.zeros(n_state + 1 - len(a))])
    for i, xi in enumerate(x):
        yi = bb[0] * xi + z[0]
        for j in range(n_state - 1):
            z[j] = bb[j + 1] * xi + z[j + 1] - aa[j + 1] * yi
        z[n_state - 1] = bb[n_state] * xi - aa[n_state] * yi
        y[i] = yi
    return y


def lfilter_zi(b: np.ndarray, a: np.ndarray) -> np.ndarray:
    """Steady-state initial conditions for _lfilter — the
    scipy.signal.lfilter_zi construction: solve
    (I − companion(a)ᵀ)·zi = b[1:] − a[1:]·b[0] after a[0]
    normalization. filtfilt seeds each pass with zi·x[0] to suppress
    edge transients (scipy.signal.filtfilt default semantics — the
    round-8 fidelity audit found the previous zero-state start
    diverged from the scipy call the reference makes)."""
    a = np.asarray(a, dtype=float)
    b = np.asarray(b, dtype=float)
    n = max(len(a), len(b))
    a0 = a[0]
    a = np.concatenate([a, np.zeros(n - len(a))]) / a0
    b = np.concatenate([b, np.zeros(n - len(b))]) / a0
    companion = np.zeros((n - 1, n - 1))
    companion[0, :] = -a[1:]
    companion[1:, :-1] += np.eye(n - 2)
    i_minus_a = np.eye(n - 1) - companion.T
    rhs = b[1:] - a[1:] * b[0]
    return np.linalg.solve(i_minus_a, rhs)


def filtfilt(b: np.ndarray, a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Zero-phase forward-backward filtering — scipy.signal.filtfilt
    default semantics exactly (the reference's call path,
    extractFeatures.py:214-261 / accelFeatures.py:24-41): odd-reflection
    padding of length 3·max(len(a), len(b)) (NOT 3·order), lfilter_zi
    initial conditions scaled by the pass's first sample, and a
    ValueError when the input is not longer than the pad (scipy raises
    rather than clamping)."""
    if _HAS_SCIPY:  # pragma: no cover
        return _scipy_signal.filtfilt(b, a, x)
    edge = 3 * max(len(a), len(b))
    if len(x) <= edge:
        raise ValueError(
            f"The length of the input vector x must be greater than "
            f"padlen, which is {edge}."
        )
    front = 2 * x[0] - x[edge:0:-1]
    back = 2 * x[-1] - x[-2 : -edge - 2 : -1]
    ext = np.concatenate([front, x, back])
    zi = lfilter_zi(b, a)
    y = _lfilter(b, a, ext, zi=zi * ext[0])
    y_last = y[-1]
    y = _lfilter(b, a, y[::-1], zi=zi * y_last)[::-1]
    return y[edge : len(y) - edge]


def low_pass(x: np.ndarray, cutoff: float = 0.5, fs: float = 25.0, order: int = 4) -> np.ndarray:
    """C13 gravity-isolation low-pass (extractFeatures.py:214-238)."""
    b, a = butter_coeffs(order, cutoff / (0.5 * fs), "low")
    return filtfilt(b, a, x)


def high_pass(x: np.ndarray, cutoff: float = 0.5, fs: float = 25.0, order: int = 2) -> np.ndarray:
    """C13 gravity-removal high-pass (extractFeatures.py:240-261)."""
    b, a = butter_coeffs(order, cutoff / (0.5 * fs), "high")
    return filtfilt(b, a, x)


# --- per-epoch features (accelFeatures.py:60-106) --------------------------


def epoch_feature_dict(
    data: np.ndarray, fs: float, prefix: str
) -> dict[str, float]:
    feats: dict[str, float] = {}
    feats[f"activity_count_{prefix}"] = float(np.sqrt(np.mean(data**2)))
    feats[f"mean_{prefix}"] = float(np.mean(data))
    feats[f"std_{prefix}"] = float(np.std(data))
    # skew/kurtosis from power sums of MEAN-SHIFTED data rather than
    # centered moments. The shift c = floor(mean + 0.5) is an integer,
    # so on integer-valued (quantized) data every shifted partial sum
    # is still exactly representable and order-independent — bit-equal
    # to a SQL replay (the a10 discipline, extended to the epoch kernel
    # so w5_epoch_moments is value-hash oracle-able). On general FLOAT
    # data the shift removes the catastrophic cancellation of raw power
    # sums (a ~1000 mg DC offset with sub-1 std would otherwise lose
    # ~1e12 of double precision in the s4 term): after shifting, the
    # residual mean is <=0.5 so every term is O(var^2), and skew/
    # kurtosis are shift-invariant. floor(x + 0.5) (not Python round,
    # which is half-even) matches DuckDB/Spark floor() bit-for-bit.
    # var**1.5 / var**2 are spelled as sqrt(var)*var and var*var: IEEE
    # ops only, no libm pow.
    n = float(len(data))
    c = math.floor(float(data.sum()) / n + 0.5)
    d = data - c
    s1 = float(d.sum())
    s2 = float((d * d).sum())
    s3 = float((d * d * d).sum())
    s4 = float((d * d * d * d).sum())
    m = s1 / n
    var = s2 / n - m * m
    if var > 0:
        feats[f"skewness_{prefix}"] = (
            s3 / n - 3 * m * (s2 / n) + 2 * m * m * m
        ) / (math.sqrt(var) * var)
        feats[f"kurtosis_{prefix}"] = (
            s4 / n - 4 * m * (s3 / n) + 6 * m * m * (s2 / n)
            - 3 * m * m * m * m
        ) / (var * var) - 3.0
    else:
        feats[f"skewness_{prefix}"] = 0.0
        feats[f"kurtosis_{prefix}"] = 0.0
    # line length: the classic EEG/accelerometry complexity measure —
    # total variation sum(|x_i - x_{i-1}|) over the epoch
    feats[f"line_length_{prefix}"] = float(np.sum(np.abs(np.diff(data))))
    # zcr — literal reproduction of accelFeatures.py:79, which has NO
    # abs: sum(diff(sign)) telescopes to sign(x[-1]) − sign(x[0]), so
    # the executed reference feature is the net sign change, not a
    # crossing count (round-8 fidelity audit). The conventional
    # |Δsign|/2n ZCR lives in functions/signal.zero_crossing_rate as
    # the C16 operator.
    feats[f"zcr_{prefix}"] = float(
        np.sum(np.diff(np.sign(data))) / (2.0 * len(data))
    )
    freqs, psd = welch_psd(data, fs)
    total = float(np.sum(psd))
    if total > 0:
        feats[f"mean_freq_{prefix}"] = float(np.sum(freqs * psd) / total)
        p = psd / total
        feats[f"entropy_{prefix}"] = float(-np.sum(p * np.log2(p + 1e-12)))
    else:
        feats[f"mean_freq_{prefix}"] = 0.0
        feats[f"entropy_{prefix}"] = 0.0
    for band, (lo, hi) in FREQ_BANDS.items():
        sel = psd[(freqs >= lo) & (freqs <= hi)]
        feats[f"total_power_{prefix}_{band}"] = float(np.sum(sel)) if sel.size else 0.0
        feats[f"peak_psd_{prefix}_{band}"] = float(np.max(sel)) if sel.size else 0.0
    return feats


def interp_sparse(
    values: np.ndarray, n_out: int, drop_sentinel: float | None = -1.0
) -> np.ndarray:
    """W8: linear interpolation of one-per-datapoint values onto the
    sample axis (extractFeatures.py:88-110: np.interp over the valid
    dps' start-sample indices, constant extrapolation at the edges).

    ``drop_sentinel`` (default −1): also treat that value as missing —
    the OSDB data-dictionary convention (hr −1 = missing), applied as
    the engine's ingest normalization. NOTE the reference's EXECUTED
    chain does NOT do this: flattenData passes hr through raw and even
    writes hr=−1 on zero-fill dps (flattenData.py:90,129), while
    extractFeatures drops only NaN (extractFeatures.py:94-96), so −1
    becomes a real interpolation knot there. Pass
    ``drop_sentinel=None`` for that literal behavior
    (tests/test_ref_dsp_parity.py pins both modes against the loop
    port)."""
    v = np.asarray(values, dtype=float)
    valid = ~np.isnan(v)
    if drop_sentinel is not None:
        valid &= v != drop_sentinel
    if not valid.any():
        return np.full(n_out, np.nan)
    xp = np.flatnonzero(valid) * (n_out / max(len(v), 1))
    return np.interp(np.arange(n_out), xp, v[valid])


def extract_epoch_features(
    events_dp: DataFrame,
    event_col: str = "eventId",
    ts_col: str = "dpTimestamp",
    signal_col: str = "rawData",
    hr_col: str = "hr",
    fs: float = 25.0,
    window_len: int = 125,
    step: int = 125,
    gravity_cutoff: float | None = 0.5,
) -> DataFrame:
    """W5 epoch segmentation + per-epoch features, one event per Arrow
    batch. Output: (event, startSample, endSample, hr, features map)."""
    out_schema = (
        f"{event_col} long, startSample long, endSample long, "
        "hr double, features map<string,double>"
    )

    def per_event(pdf: pd.DataFrame) -> Iterator[pd.DataFrame] | pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        segs = [np.asarray(s, dtype=float) for s in pdf[signal_col] if s is not None]
        if not segs:
            return pd.DataFrame(
                columns=[event_col, "startSample", "endSample", "hr", "features"]
            )
        sig = np.concatenate(segs)
        if gravity_cutoff is not None and len(sig) > 9:
            sig = high_pass(sig, gravity_cutoff, fs)
        hr = interp_sparse(pdf[hr_col].to_numpy(), len(sig))
        eid = pdf[event_col].iloc[0]
        rows = []
        for start in range(0, len(sig) - window_len + 1, step):
            seg = sig[start : start + window_len]
            feats = epoch_feature_dict(seg, fs, "magnitude")
            hr_mean = float(np.nanmean(hr[start : start + window_len]))
            rows.append(
                {
                    event_col: eid,
                    "startSample": start,
                    "endSample": start + window_len,
                    "hr": None if math.isnan(hr_mean) else hr_mean,
                    "features": feats,
                }
            )
        return pd.DataFrame(
            rows, columns=[event_col, "startSample", "endSample", "hr", "features"]
        )

    return (
        events_dp.select(event_col, ts_col, signal_col, hr_col)
        .groupBy(event_col)
        .applyInPandas(per_event, out_schema)
    )


def spectral_history(
    events_dp: DataFrame,
    event_col: str = "eventId",
    ts_col: str = "dpTimestamp",
    signal_col: str = "rawData",
    window_len: int = 125,
    step: int = 125,
    low_movement_std: float = 10.0,
    zero_tol: float = 0.001,
    normalize: bool = False,
) -> DataFrame:
    """W9 spectrogram — literal reproduction of the reference's
    generateSpectralHistoryFromAccelLst2 (eventAnalyser.py:236-274):

    * sliding geometry: endPosn starts at windowLen and advances by
      step WHILE endPosn < len(signal) — the final window ending
      exactly at len is NOT emitted (the reference's executed
      behavior; round-8 fidelity audit)
    * low-movement gate: slice population-std >= threshold computes
      the spectrum, else the slice is zeroed (default 10 milli-g)
    * spectrum: |fft|² with small values clipped to zero
      (|power| < zeroTol, default 0.001) to reduce normalization
      artefacts, then bins 1..windowLen//2−1 emitted — DC and the
      top half-spectrum bin are EXCLUDED (fftPow[1:fftLen],
      fftLen = windowLen//2)
    * normalize: divide by the max of the emitted bins post-clip;
      all-zero slices stay zero

    (The reference passes a taper window name to getFFT, which
    computes the windowed array and then transforms the UNWINDOWED
    signal — osdAlgTools.py:96-100 — so no taper is applied here
    either, matching the executed path.)
    """
    out_schema = f"{event_col} long, sliceIdx int, spectrum array<double>"
    n_bins = window_len // 2 - 1  # bins 1..fftLen-1

    def per_event(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        segs = [np.asarray(s, dtype=float) for s in pdf[signal_col] if s is not None]
        if not segs:
            return pd.DataFrame(columns=[event_col, "sliceIdx", "spectrum"])
        sig = np.concatenate(segs)
        eid = pdf[event_col].iloc[0]
        rows = []
        idx = 0
        end = window_len
        while end < len(sig):
            seg = sig[end - window_len : end]
            if np.std(seg) >= low_movement_std:
                spec = np.abs(np.fft.fft(seg)[: window_len // 2]) ** 2
                spec[np.abs(spec) < zero_tol] = 0.0
                spec = spec[1:]
                if normalize:
                    peak = np.max(spec)
                    spec = spec / peak if peak != 0 else np.zeros(n_bins)
            else:
                spec = np.zeros(n_bins)
            rows.append({event_col: eid, "sliceIdx": idx, "spectrum": spec.tolist()})
            idx += 1
            end += step
        return pd.DataFrame(rows, columns=[event_col, "sliceIdx", "spectrum"])

    return (
        events_dp.select(event_col, ts_col, signal_col)
        .groupBy(event_col)
        .applyInPandas(per_event, out_schema)
    )
