"""Literal-port parity for the remaining DSP/detector kernels (round-7
verdict ask #3): each test's golden is an INDEPENDENT execution of the
reference function's algorithm on a fixture — ported loops / an
independent construction — never a paraphrase of the engine kernel, so
a silent engine divergence fails here instead of surviving a circular
test.

Covered:
* C14 Welch PSD + band defs — accelFeatures.py:86-106 calls
  scipy.signal.welch(x, fs, nperseg=None, window=hann(len(x)),
  scaling='density'); scipy is absent in this container, so the golden
  executes scipy's documented one-segment path step by step (symmetric
  Hann, constant detrend, 1/(fs·Σw²) density scale, one-sided
  doubling), written independently of functions/features.welch_psd.
* C13 Butterworth defaults + coefficients — extractFeatures.py:214-261
  (low: cutoff 0.5, order 4; high: cutoff 0.5, order 2); the golden
  builds (b, a) by direct polynomial substitution of the bilinear
  transform into the analog prototype — a different algebra route than
  butter_coeffs' zpk path.
* filtfilt zi-seeding — scipy.signal.filtfilt's lfilter_zi property:
  a constant input produces the steady-state output from sample 0
  (zero transient), which a zero-state start cannot do.
* W9 spectrogram — eventAnalyser.py:236-274
  generateSpectralHistoryFromAccelLst2 ported loop-for-loop (endPosn
  geometry, sd gate, zeroTol clip, bins 1..fftLen-1, post-clip
  normalize).
* hrAlg — testRunner/hrAlg.py processDp ported verbatim-semantics
  (history incl. -1 slots, adaptive offsets, the dead -1 store
  overwritten to 0) for all three modes.
"""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Row

from openseizuredatabase_spark.detection.hr_alg import (
    MODE_ADAPTIVE,
    MODE_AVERAGE,
    MODE_SIMPLE,
    HrSettings,
    run_hr_alg,
)
from openseizuredatabase_spark.functions import features as feat


def _fixture(n=125, seed_mode="mixed"):
    t = np.arange(n) / 25.0
    if seed_mode == "mixed":
        return (
            1000.0
            + 80.0 * np.sin(2 * np.pi * 4.3 * t)
            + 30.0 * np.sin(2 * np.pi * 9.1 * t + 0.7)
            + 5.0 * np.sin(2 * np.pi * 0.3 * t)
        )
    return 1000.0 + 100.0 * np.sin(2 * np.pi * 5.0 * t)


# --- C14: Welch ---------------------------------------------------------------


def _scipy_welch_one_segment(x, fs):
    """scipy.signal.welch with nperseg=None and window=hann(len(x)):
    one segment, constant detrend, symmetric Hann, density scaling,
    one-sided doubling — written from scipy's documented algorithm."""
    n = len(x)
    i = np.arange(n)
    win = 0.5 - 0.5 * np.cos(2 * np.pi * i / (n - 1))  # sym Hann
    seg = x - np.mean(x)  # detrend='constant'
    spec = np.fft.rfft(seg * win)
    psd = (spec.real**2 + spec.imag**2) / (fs * np.dot(win, win))
    if n % 2 == 0:
        psd[1:-1] *= 2.0
    else:
        psd[1:] *= 2.0
    freqs = np.arange(len(psd)) * fs / n
    return freqs, psd


def test_welch_matches_reference_call_path():
    for x in (_fixture(125), _fixture(125, "sine"), _fixture(50)):
        f_ref, p_ref = _scipy_welch_one_segment(x, 25.0)
        f_got, p_got = feat.welch_psd(x, 25.0)
        assert np.allclose(f_got, f_ref, rtol=0, atol=1e-12)
        assert np.allclose(p_got, p_ref, rtol=1e-10, atol=1e-12)


def test_freq_band_table_matches_reference():
    """extractFeatures.py:162-178 — the 14 named bands, inclusive
    [lower, upper] selection (accelFeatures.py:100-106)."""
    expect = {
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
    assert dict(feat.FREQ_BANDS) == expect
    # band powers = plain sums of density bins with BOTH edges inclusive
    x = _fixture(125)
    freqs, psd = _scipy_welch_one_segment(x, 25.0)
    f = feat.epoch_feature_dict(x, 25.0, "m")
    for band, (lo, hi) in expect.items():
        sel = psd[(freqs >= lo) & (freqs <= hi)]
        assert f[f"total_power_m_{band}"] == pytest.approx(
            float(np.sum(sel)), rel=1e-9
        )
        assert f[f"peak_psd_m_{band}"] == pytest.approx(
            float(np.max(sel)), rel=1e-9
        )


# --- C13: Butterworth ---------------------------------------------------------


def _butter_by_polynomial_substitution(order, wn, btype):
    """Independent (b, a) construction: analog Butterworth denominator
    assembled as a real polynomial from the prototype poles, then the
    bilinear transform applied by direct polynomial substitution
    s = 4(z-1)/(z+1) — no zpk mapping, unlike butter_coeffs."""
    k = np.arange(order)
    poles = np.exp(1j * np.pi * (2 * k + order + 1) / (2 * order))
    warped = 4.0 * np.tan(np.pi * wn / 2.0)
    if btype == "low":
        d = np.real(np.poly(poles * warped))  # D(s), highest power first
        num_coeffs = np.zeros(order + 1)
        num_coeffs[-1] = warped**order  # N(s) = warped^n
    else:
        d = np.real(np.poly(warped / poles))
        num_coeffs = np.zeros(order + 1)
        num_coeffs[0] = 1.0  # N(s) = s^n
    zp1 = np.array([1.0, 1.0])  # (z+1)
    zm1 = np.array([1.0, -1.0])  # (z-1)

    def substitute(coeffs):
        # Σ c_k s^k → Σ c_k 4^k (z-1)^k (z+1)^(n-k), coeffs highest-first
        n = len(coeffs) - 1
        acc = np.zeros(n + 1)
        for idx, c in enumerate(coeffs):
            kpow = n - idx  # power of s for this coefficient
            term = np.array([c * 4.0**kpow])
            for _ in range(kpow):
                term = np.convolve(term, zm1)
            for _ in range(n - kpow):
                term = np.convolve(term, zp1)
            acc += term
        return acc

    a = substitute(d)
    b = substitute(num_coeffs)
    b, a = b / a[0], a / a[0]
    # exact passband normalization, as butter_coeffs applies
    ref = 1.0 if btype == "low" else -1.0
    b = b / (np.polyval(b, ref) / np.polyval(a, ref))
    return b, a


@pytest.mark.parametrize(
    "order,wn,btype",
    [
        (4, 0.5 / 12.5, "low"),  # extractFeatures.py low_pass defaults
        (2, 0.5 / 12.5, "high"),  # extractFeatures.py high_pass defaults
        (4, 0.5 / 12.5, "high"),  # accelFeatures.butter_highpass_filter
        (2, 0.2, "low"),  # the c13 oracle's filter
    ],
)
def test_butter_coeffs_match_independent_construction(order, wn, btype):
    b_got, a_got = feat.butter_coeffs(order, wn, btype)
    b_ref, a_ref = _butter_by_polynomial_substitution(order, wn, btype)
    assert np.allclose(a_got / a_got[0], a_ref, rtol=1e-9, atol=1e-12)
    assert np.allclose(b_got / a_got[0], b_ref, rtol=1e-9, atol=1e-12)


def test_reference_filter_defaults():
    """Pin the reference call signatures: low_pass(cutoff=0.5, fs=25,
    order=4) (extractFeatures.py:214-238), high_pass(cutoff=0.5, fs=25,
    order=2) (extractFeatures.py:240-261)."""
    import inspect

    lp = inspect.signature(feat.low_pass).parameters
    assert (lp["cutoff"].default, lp["fs"].default, lp["order"].default) == (
        0.5,
        25.0,
        4,
    )
    hp = inspect.signature(feat.high_pass).parameters
    assert (hp["cutoff"].default, hp["fs"].default, hp["order"].default) == (
        0.5,
        25.0,
        2,
    )


def test_filtfilt_scipy_semantics():
    """scipy.signal.filtfilt properties the old zero-state/short-pad
    version violated: (a) padlen = 3*max(len(a), len(b)) with a
    ValueError on too-short inputs (scipy raises, never clamps);
    (b) lfilter_zi seeding ⇒ a constant input is in steady state from
    sample 0 — the filtered constant is EXACTLY flat, no edge
    transient."""
    b, a = feat.butter_coeffs(2, 0.2, "low")
    with pytest.raises(ValueError):
        feat.filtfilt(b, a, np.ones(9))  # padlen = 9 needs len > 9
    x = np.full(40, 7.25)
    y = feat.filtfilt(b, a, x)
    assert np.allclose(y, 7.25, rtol=0, atol=1e-9)
    # and the zi construction itself: lfilter seeded with zi*x0 holds a
    # step input at steady state from the first output sample
    zi = feat.lfilter_zi(b, a)
    step = feat._lfilter(b, a, np.full(20, 3.0), zi=zi * 3.0)
    assert np.allclose(step, 3.0, rtol=0, atol=1e-12)


# --- W9: spectral history ------------------------------------------------------


def _ref_spectral_history(acc, window_len=125, step=125, sd_thresh=10.0,
                          zero_tol=0.001, normalise=False):
    """Loop-for-loop port of generateSpectralHistoryFromAccelLst2
    (eventAnalyser.py:236-274): endPosn geometry, sd gate, |fft|² via
    absolute-then-square, zeroTol clip, bins 1..fftLen-1, post-clip
    normalization."""
    out = []
    fft_len = int(window_len / 2)
    arr = np.array(acc)
    end = window_len
    while end < len(arr):
        sl = arr[end - window_len : end]
        if sl.std() >= sd_thresh:
            fft = np.fft.fft(sl)
            mag = np.absolute(fft)
            pow_ = np.square(mag)
            pow_[abs(pow_) < zero_tol] = 0
            if normalise:
                if np.max(pow_[1:fft_len]) != 0:
                    out.append(pow_[1:fft_len] / np.max(pow_[1:fft_len]))
                else:
                    out.append(np.zeros(fft_len - 1))
            else:
                out.append(pow_[1:fft_len])
        else:
            out.append(np.zeros(fft_len - 1))
        end += step
    return out


@pytest.mark.parametrize("normalise", [False, True])
def test_spectral_history_matches_reference_port(spark, normalise):
    """Engine spectral_history output byte-equals the reference port on
    a fixture with an active slice, a low-movement slice, and values
    straddling the zeroTol clip."""
    t = np.arange(125) / 25.0
    active = 1000.0 + 100.0 * np.sin(2 * np.pi * 5.0 * t)
    weak = 1000.0 + 12.0 * np.sin(2 * np.pi * 3.0 * t)  # std ≈ 8.5 < 10
    tiny = 1000.0 + 0.004 * np.sin(2 * np.pi * 4.0 * t) + 20.0 * np.sin(
        2 * np.pi * 7.0 * t
    )  # leak bins near the 0.001 clip
    frames = [active, weak, tiny, active]  # last frame dropped (endPosn<len)
    sig = np.concatenate(frames)
    expect = _ref_spectral_history(sig, normalise=normalise)
    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(
            eventId=1,
            dpTimestamp=base + dt.timedelta(seconds=5 * k),
            rawData=[float(v) for v in fr],
        )
        for k, fr in enumerate(frames)
    ]
    got = (
        feat.spectral_history(
            spark.createDataFrame(rows), normalize=normalise
        )
        .toPandas()
        .sort_values("sliceIdx")
    )
    assert len(got) == len(expect) == 3
    for (_, row), exp in zip(got.iterrows(), expect):
        assert len(row.spectrum) == 61
        assert np.array_equal(np.array(row.spectrum), exp), row.sliceIdx


# --- hrAlg ---------------------------------------------------------------------


class RefHr:
    """Literal port of testRunner/hrAlg.py:29-156 (settings, addToHist,
    calcAvgHr, the three check modes, and processDp's recurrence
    INCLUDING the dead -1 store that the fall-through overwrites)."""

    def __init__(self, mode, thresh_high=120.0, thresh_low=40.0,
                 off_high=30.0, off_low=20.0, window_secs=60.0,
                 sample_period=5.0, warn_time=5.0, alarm_time=10.0):
        self.mode = mode
        self.th, self.tl = thresh_high, thresh_low
        self.oh, self.ol = off_high, off_low
        self.window_dps = int(window_secs / 5.0)  # hrAlg.py:35
        self.sp, self.wt, self.at = sample_period, warn_time, alarm_time
        self.hist = []
        self.state, self.count = 0, 0.0

    def _avg(self):  # hrAlg.py:55-67
        s, n = 0.0, 0
        for v in self.hist:
            if v != -1:
                s += v
                n += 1
        return s / n if n > 0 else -1

    def _add(self, v):  # hrAlg.py:69-74
        self.hist.append(v)
        if len(self.hist) > self.window_dps:
            del self.hist[0]

    def step(self, hr):  # hrAlg.py:116-156
        self._add(hr)
        in_alarm = 0
        if hr == -1:
            self.state = -1
            self.count = 0
        else:
            if self.mode == MODE_SIMPLE:
                in_alarm = 2 if (hr > self.th) or (hr < self.tl) else 0
            elif self.mode == MODE_ADAPTIVE:
                av = self._avg()
                in_alarm = 2 if (hr > av + self.oh) or (hr < av - self.ol) else 0
            else:
                av = self._avg()
                in_alarm = 2 if (av > self.th) or (av < self.tl) else 0
        if in_alarm:
            self.count += self.sp
            if self.count > self.at:
                self.state = 2
            elif self.count > self.wt:
                self.state = 1
        else:
            if self.state == 2:
                self.state = 1
                self.count = self.wt
            else:
                self.state = 0
                self.count = 0
        return self.state, self.count


def test_spec_spectrogram_matches_reference_port():
    """make_spectrogram against a loop port of specCnnModel.py's
    generateSpectralHistoryFromAccelLst (the specAlg variant — distinct
    from eventAnalyser's: endPosn <= len INCLUSIVE, per-slice mean
    removal then /1000, sd gate disabled, UNSQUARED |fft| magnitude,
    bins 0..fftLen-1 INCLUDING DC, 0.001 clip)."""
    from openseizuredatabase_spark.detection.model_algs import (
        SpecSettings,
        make_spectrogram,
    )

    def ref_spec_hist(acc_lst, window_len, step_len, zero_tol=0.001):
        spec_lst = []
        fft_len = int(window_len / 2)
        raw = np.array(acc_lst, dtype="float")
        end = window_len
        while end <= len(acc_lst):
            slice_raw = raw[end - window_len : end]
            slice_ = slice_raw - np.mean(slice_raw)
            slice_ = slice_ / 1000.0
            fft = np.fft.fft(slice_)
            mag = np.absolute(fft)
            mag[abs(mag) < zero_tol] = 0
            spec_lst.append(mag[0:fft_len])
            end += step_len
        return np.stack(spec_lst, axis=1)

    t = np.arange(250) / 25.0
    x = 1000.0 + 80.0 * np.sin(2 * np.pi * 4.3 * t) + 20.0 * np.sin(
        2 * np.pi * 9.1 * t + 0.4
    )
    for spec_samp, spec_step in [(125, 125), (50, 5)]:
        s = SpecSettings(
            analysis_samp=250, spec_samp=spec_samp, spec_step=spec_step
        )
        got = make_spectrogram(x, s)
        expect = ref_spec_hist(x, spec_samp, spec_step)
        assert got.shape == expect.shape, (spec_samp, spec_step)
        assert np.array_equal(got, expect), (spec_samp, spec_step)


def test_nn_buffer_vector_matches_reference_port(spark):
    """The nnAlg input pipeline against a port of
    deepEpiCnnModel_torch.accData2vector (:249-286): rolling buffer
    trimmed to the LAST bufferSamples, None until full, mG→G /1000,
    optional z-norm with the std==0 guard."""

    class RefBuf:
        def __init__(self, buffer_samples):
            self.n = buffer_samples
            self.buf = []

        def step(self, acc, normalise=False):
            self.buf.extend(acc)
            if len(self.buf) > self.n:
                self.buf = self.buf[-self.n :]
            if len(self.buf) < self.n:
                return None
            vec = np.array(self.buf[-self.n :], dtype=float) / 1000.0
            if normalise:
                std = vec.std()
                if std != 0:
                    vec = (vec - vec.mean()) / std
                else:
                    vec = vec - vec.mean()
            return vec

    # drive the REAL engine path (run_nn_alg) with a probe scorer that
    # echoes a deterministic reduction of the input vector, so the
    # buffered vector the engine actually built byte-compares with the
    # port's
    import datetime as _dt

    from openseizuredatabase_spark.detection.model_algs import (
        NnSettings,
        run_nn_alg,
    )

    frames = [
        1000.0 + 50.0 * np.sin(2 * np.pi * (2 + k) * np.arange(125) / 25.0)
        for k in range(4)
    ]
    base = _dt.datetime(2024, 1, 1)
    rows = [
        Row(
            eventId=1,
            dpTimestamp=base + _dt.timedelta(seconds=5 * k),
            rawData=[float(v) for v in fr],
        )
        for k, fr in enumerate(frames)
    ]
    for normalise in (False, True):
        s = NnSettings(buffer_seconds=10.0, normalise=normalise)  # 250 samp
        probe = lambda vec: float(np.sum(vec * np.arange(len(vec))))
        out = (
            run_nn_alg(spark.createDataFrame(rows), probe, s)
            .toPandas()
            .sort_values("dpTimestamp")
        )
        ref = RefBuf(250)
        for (_, row), fr in zip(out.iterrows(), frames):
            vec = ref.step(list(fr), normalise)
            if vec is None:
                assert not row.valid and pd.isna(row.pSeizure)
            else:
                assert row.valid
                expect = float(np.sum(vec * np.arange(len(vec))))
                assert row.pSeizure == expect, normalise


def test_hr_interp_matches_reference_port():
    """interp_sparse(drop_sentinel=None) against a literal port of the
    extractFeatures.py:88-110 interpolation: knots at the valid dps'
    start-sample indices (125·k), NaN-only validity (−1 is a REAL knot
    in the executed chain — flattenData.py:90,129 pass it through),
    np.interp's clamped linear fill; the default −1-dropping mode is
    the engine's documented ingest normalization on top."""

    def ref_interp(hr_per_dp):
        hr_raw, sample_indices = [], []
        sample_count = 0
        for hr_val in hr_per_dp:
            if not np.isnan(hr_val):
                hr_raw.append(hr_val)
                sample_indices.append(sample_count)
            sample_count += 125
        total = len(hr_per_dp) * 125
        if len(hr_raw) == 0:
            return np.full(total, np.nan)
        return np.interp(np.arange(total), sample_indices, hr_raw)

    cases = [
        [60.0, np.nan, 80.0, 75.0],
        [np.nan, 55.0, np.nan, np.nan, 90.0],
        [60.0, -1.0, 80.0],  # the executed chain keeps -1 as a knot
        [np.nan, np.nan],
    ]
    for hrs in cases:
        v = np.array(hrs)
        expect = ref_interp(v)
        got = feat.interp_sparse(v, len(v) * 125, drop_sentinel=None)
        assert np.array_equal(got, expect, equal_nan=True), hrs
    # the normalization mode treats -1 as missing instead
    got_norm = feat.interp_sparse(np.array([60.0, -1.0, 80.0]), 375)
    expect_norm = np.interp(np.arange(375), [0.0, 250.0], [60.0, 80.0])
    assert np.array_equal(got_norm, expect_norm)


def test_dp_stream_repair_matches_reference_port(spark):
    """repair_dp_stream row-for-row against a literal port of the
    flattenData.py:274-337 gap/overlap walk — including the stateful
    overlap skip (the skipped dp does NOT move the carried end, so the
    next comparison is against the last KEPT dp) and the
    gap-shorter-than-one-dp branch (detected, zero fills emitted)."""
    from openseizuredatabase_spark.operators.windows import repair_dp_stream

    DUR, TOL = 5.0, 2.0

    def ref_walk(times):
        rows = []
        last_end = None
        for t in times:
            dt_start = t - DUR  # flattenData.py:280
            if last_end is None:
                rows.append((t, "dp"))
                last_end = t
            else:
                gap = dt_start - last_end
                if gap > TOL:
                    num = int(gap / DUR)
                    for i in range(num):
                        rows.append((last_end + DUR * (i + 1), "fill"))
                    last_end = last_end + DUR * num
                elif gap < -TOL:
                    continue  # overlap: skip, last_end unchanged
                rows.append((t, "dp"))
                last_end = t
        return rows

    streams = {
        # gaps, borderline, skip, post-skip fill, sub-dp gap, long gap
        1: [0.0, 5.0, 23.0, 28.0, 30.0, 41.0, 48.0, 78.0],
        # consecutive overlaps: both compare against the same kept dp
        2: [0.0, 5.0, 7.0, 8.0, 9.0, 14.0],
        # keep-at-exact-tolerance (-2.0 is NOT an overlap)
        3: [0.0, 5.0, 8.0, 13.0],
    }
    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(eventId=eid, dpTimestamp=base + dt.timedelta(seconds=t))
        for eid, ts in streams.items()
        for t in ts
    ]
    out = (
        repair_dp_stream(
            spark.createDataFrame(rows), ["eventId"], "dpTimestamp"
        )
        .toPandas()
        .sort_values(["eventId", "epoch_s", "kind"])
    )
    base_e = base.replace(tzinfo=dt.timezone.utc).timestamp()
    for eid, ts in streams.items():
        expect = sorted(
            [(base_e + t, k) for t, k in ref_walk(ts)]
        )
        got = sorted(
            (r.epoch_s, r.kind)
            for _, r in out[out.eventId == eid].iterrows()
        )
        assert got == expect, eid
    # the stateful cases actually fired: stream 2 drops two overlaps
    assert len(out[out.eventId == 2]) == 4
    # and stream 1 contains the post-skip fill at the kept-row grid
    assert (base_e + 33.0, "fill") in set(
        (r.epoch_s, r.kind) for _, r in out[out.eventId == 1].iterrows()
    )


def test_tapers_match_reference_port():
    """Window formulas byte-match loop ports of osdAlgTools.py:27-92 —
    including the executed triangular (n/2 denominators, last sample
    2/n ≠ 0) and the 'raisedCosine' that is algebraically Hann."""
    import math as m

    from openseizuredatabase_spark.functions import signal as sig

    n = 125
    tri = np.array([1 - m.fabs((i - n / 2) / (n / 2)) for i in range(n)])
    ham = np.array(
        [0.54 - 0.46 * np.cos(2 * np.pi * i / (n - 1)) for i in range(n)]
    )
    hann = np.array(
        [0.5 * (1 - np.cos(2 * np.pi * i / (n - 1))) for i in range(n)]
    )
    rc = np.array(
        [0.5 * (1 - np.cos(2 * np.pi * i / (n - 1))) for i in range(n)]
    )
    assert np.array_equal(sig.taper("triangular", n), tri)
    assert np.array_equal(sig.taper("hamming", n), ham)
    assert np.array_equal(sig.taper("hann", n), hann)
    assert np.array_equal(sig.taper("raised_cosine", n), rc)
    assert np.array_equal(sig.taper("rect", n), np.ones(n))
    # the executed triangular is NOT the symmetric Bartlett window
    assert tri[-1] == pytest.approx(2.0 / n)
    assert tri[-1] != 0.0


def test_mean_line_length_matches_reference_port(spark):
    """C15 against a loop port of libosd getMeanLineLength
    (osdAlgTools.py:161-172)."""
    from pyspark.sql import functions as F

    from openseizuredatabase_spark.functions import signal as sig

    x = [
        float(v)
        for v in 1000.0 + 80.0 * np.sin(2 * np.pi * 4.3 * np.arange(50) / 25.0)
    ]

    def ref_mll(acc):
        n = len(acc)
        if n < 2:
            return 0.0
        ll = 0.0
        for i in range(1, n):
            ll += abs(acc[i] - acc[i - 1])
        return ll / (n - 1)

    got = (
        spark.createDataFrame([Row(a=x)])
        .select(sig.mean_line_length(F.col("a")).alias("ll"))
        .collect()[0]
        .ll
    )
    assert got == pytest.approx(ref_mll(x), rel=1e-12)


def test_jamie1_features_match_reference_port():
    """jamie1's per-dp spectral features byte-match a literal port of
    jamie1.py:47-110: re²+im² magnitude, sum over range(1, nSamp) gated
    i <= freq2fftBin(sampleFreq/2), /nSamp/2, ROI [nMin, nMax) mean, NO
    ACCEL_SCALE_FACTOR, ratio gated on SPECPOWER > alarmThresh (unlike
    osdAlg's roiPower gate)."""
    from openseizuredatabase_spark.detection.dp_model_algs import (
        DpModelSettings,
        jamie1_vectorize,
    )

    def ref_features(acc):
        freq_res = 1.0 / 5.0  # jamie1.py:31
        n_samp = int(5.0 * 25.0)
        n_cut = int((25.0 / 2.0) / freq_res)
        fft_arr = np.fft.fft(acc)

        def mag(c):
            return c.real * c.real + c.imag * c.imag

        spec = 0.0
        for i in range(1, n_samp):  # jamie1.py:80-85 (full range, gated)
            if i <= n_cut:
                spec = spec + mag(fft_arr[i])
        spec = spec / n_samp / 2
        lo, hi = int(3.0 / freq_res), int(8.0 / freq_res)
        roi = 0.0
        for i in range(lo, hi):
            roi = roi + mag(fft_arr[i])
        roi = roi / (hi - lo)
        ratio = 10.0 * roi / spec if spec > 100.0 else 0.0
        return spec, roi, ratio

    s = DpModelSettings(alarm_thresh=100.0)
    build = jamie1_vectorize(s)
    t = np.arange(125) / 25.0
    for x in (
        1000.0 + 300.0 * np.sin(2 * np.pi * 4.7 * t),
        1000.0 + 2.0 * np.sin(2 * np.pi * 5.0 * t),  # below the gate
    ):
        mat, valid = build(
            pd.Series([list(x)]), pd.Series([70.0])
        )
        assert valid[0]
        rows = mat[0].reshape(125, 5)
        spec, roi, ratio = ref_features(x)
        assert rows[0, 0] == spec
        assert rows[0, 1] == roi
        assert rows[0, 2] == ratio
        assert rows[0, 3] == 70.0
        assert np.array_equal(rows[:, 4], x)


@pytest.mark.parametrize("mode", [MODE_SIMPLE, MODE_ADAPTIVE, MODE_AVERAGE])
def test_hr_alg_matches_reference_port(spark, mode):
    """Per-dp state/count parity against the hrAlg.py port for a series
    with gaps, alarm runs, decay, and a post-gap re-entry (exercises
    the dead -1 store: the reference emits 0 for missing dps)."""
    hrs = [80, 85, 130, 131, 132, 133, 80, -1, 135, 136, 30, 30, 30, -1, -1, 82]
    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(eventId=9, dpTimestamp=base + dt.timedelta(seconds=5 * i), hr=float(h))
        for i, h in enumerate(hrs)
    ]
    s = HrSettings(
        mode=mode, thresh_high=120, thresh_low=40, thresh_offset_high=30,
        thresh_offset_low=20, moving_average_window_dps=12,
        sample_period=5, warn_time=5, alarm_time=10,
    )
    got = (
        run_hr_alg(spark.createDataFrame(rows), s)
        .toPandas()
        .sort_values("dpTimestamp")
    )
    ref = RefHr(mode)
    expect = [ref.step(float(h)) for h in hrs]
    assert got["alarmState"].tolist() == [st for st, _ in expect], mode
    assert got["alarmCount"].tolist() == [float(c) for _, c in expect], mode
    # the fixture must actually exercise a missing step and an alarm
    assert -1.0 in got["hr"].tolist()
    if mode == MODE_SIMPLE:
        assert 2 in got["alarmState"].tolist()
