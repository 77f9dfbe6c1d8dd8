"""Feature-extraction layer tests: numpy DSP primitives validated against
first principles, epoch extraction driven through Spark."""

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import Row

from openseizuredatabase_spark.functions import features as feat


def sine(freq, amp, n=500, fs=25.0, baseline=0.0):
    t = np.arange(n) / fs
    return baseline + amp * np.sin(2 * np.pi * freq * t)


# --- DSP primitives --------------------------------------------------------


def test_welch_psd_peak_location_and_parseval():
    x = sine(5.0, 10.0)
    freqs, psd = feat.welch_psd(x, 25.0)
    assert freqs[np.argmax(psd)] == pytest.approx(5.0, abs=0.2)
    # density scaling: integral ≈ signal variance (Hann leakage ~... loose)
    var_est = float(np.sum(psd) * (freqs[1] - freqs[0]))
    assert 0.3 * x.var() < var_est < 3 * x.var()


def test_butter_lowpass_passes_dc_blocks_high():
    b, a = feat.butter_coeffs(4, 0.5 / 12.5, "low")
    # unit DC gain by construction
    assert np.polyval(b, 1.0) / np.polyval(a, 1.0) == pytest.approx(1.0)
    x = sine(0.1, 1.0, baseline=5.0) + sine(8.0, 1.0)
    y = feat.low_pass(x, 0.5, 25.0, 4)
    # high-frequency content crushed; slow content retained
    assert np.std(y - feat.low_pass(sine(0.1, 1.0, baseline=5.0), 0.5, 25.0, 4)) < 0.1


def test_butter_highpass_removes_gravity():
    x = sine(5.0, 100.0, baseline=1000.0)
    y = feat.high_pass(x, 0.5, 25.0, 2)
    assert abs(np.mean(y[50:-50])) < 2.0  # 1000 mg baseline removed
    # 5 Hz band preserved (well above 0.5 Hz cutoff)
    assert np.std(y[50:-50]) == pytest.approx(np.std(x - 1000.0), rel=0.1)


def test_filtfilt_zero_phase():
    x = sine(2.0, 1.0)
    b, a = feat.butter_coeffs(2, 0.8, "low")  # generous passband
    y = feat.filtfilt(b, a, x)
    # zero-phase: peak positions unchanged
    assert np.argmax(y[100:200]) == np.argmax(x[100:200])


def test_epoch_feature_dict_sanity():
    x = sine(5.0, 100.0)
    f = feat.epoch_feature_dict(x[:125], 25.0, "magnitude")
    assert f["mean_magnitude"] == pytest.approx(0.0, abs=1.0)
    assert f["activity_count_magnitude"] == pytest.approx(100.0 / math.sqrt(2), rel=0.05)
    assert f["mean_freq_magnitude"] == pytest.approx(5.0, abs=0.5)
    # 5 Hz falls in these bands and not in late_clonus (1-2 Hz)
    assert f["total_power_magnitude_3-5Hz"] > 100 * f["total_power_magnitude_late_clonus"]
    # the reference zcr (accelFeatures.py:79) has no abs — it telescopes
    # to (sign(x[-1]) - sign(x[0])) / 2n, NOT a crossing count
    expect_zcr = (np.sign(x[124]) - np.sign(x[0])) / (2.0 * 125)
    assert f["zcr_magnitude"] == expect_zcr


def test_epoch_moments_stable_under_dc_offset():
    """Skew/kurtosis must not cancel catastrophically when a large DC
    offset (e.g. ~1000 milli-g gravity) rides on a tiny AC component —
    the failure mode of raw (unshifted) power sums. The mean-shift
    makes every term O(var^2), so the result matches a reference
    centered-moment computation to float64 precision."""
    rng = np.random.default_rng(7)
    x = 1000.0 + 0.3 * rng.standard_normal(125)  # mean≈1000, std≈0.3
    f = feat.epoch_feature_dict(x, 25.0, "m")
    d = x - x.mean()
    m2, m3, m4 = (np.mean(d**2), np.mean(d**3), np.mean(d**4))
    assert f["skewness_m"] == pytest.approx(m3 / m2**1.5, abs=1e-6)
    assert f["kurtosis_m"] == pytest.approx(m4 / m2**2 - 3.0, abs=1e-6)


def test_epoch_moments_shift_invariant_on_integers():
    """On integer-quantized data the shifted power sums are exact, so
    adding any integer offset leaves skew/kurtosis bit-identical."""
    rng = np.random.default_rng(11)
    base = np.round(rng.standard_normal(50) * 40)
    f0 = feat.epoch_feature_dict(base, 25.0, "m")
    f1 = feat.epoch_feature_dict(base + 977.0, 25.0, "m")
    assert f0["skewness_m"] == f1["skewness_m"]
    assert f0["kurtosis_m"] == f1["kurtosis_m"]


def test_interp_sparse():
    out = feat.interp_sparse(np.array([60.0, -1.0, 80.0]), 6)
    assert out[0] == 60.0
    assert out[-1] == 80.0
    assert np.all(np.diff(out) >= 0)
    assert np.isnan(feat.interp_sparse(np.array([-1.0, -1.0]), 4)).all()


# --- Spark stages ----------------------------------------------------------


@pytest.fixture(scope="module")
def dp_frame(spark):
    base = dt.datetime(2024, 1, 1)
    sig = sine(5.0, 300.0, n=125, baseline=1000.0)
    rows = []
    for eid in (1, 2):
        for k in range(4):  # 500 samples per event
            rows.append(
                Row(
                    eventId=eid,
                    dpTimestamp=base + dt.timedelta(seconds=5 * k),
                    rawData=[float(v) for v in sig],
                    hr=60.0 + 10 * k,
                )
            )
    return spark.createDataFrame(rows)


def test_extract_epoch_features_spark(dp_frame):
    out = feat.extract_epoch_features(dp_frame, window_len=125, step=125).collect()
    # 500 samples / 125 window, no overlap → 4 epochs × 2 events
    assert len(out) == 8
    r0 = [r for r in out if r.eventId == 1 and r.startSample == 0][0]
    assert r0.endSample == 125
    assert isinstance(r0.features, dict) and len(r0.features) > 30
    # gravity high-pass removed the 1000 baseline before features
    assert abs(r0.features["mean_magnitude"]) < 5.0
    assert r0.features["mean_freq_magnitude"] == pytest.approx(5.0, abs=0.6)
    # W8: interpolated HR rises across epochs
    hrs = [r.hr for r in sorted(out, key=lambda r: (r.eventId, r.startSample))][:4]
    assert hrs == sorted(hrs)


def test_spectral_history_spark(dp_frame, spark):
    quiet = [
        Row(
            eventId=3,
            dpTimestamp=dt.datetime(2024, 1, 1) + dt.timedelta(seconds=5 * k),
            rawData=[1000.0] * 125,
            hr=0.0,
        )
        for k in range(2)
    ]
    both = dp_frame.unionByName(spark.createDataFrame(quiet, dp_frame.schema))
    out = feat.spectral_history(both, low_movement_std=10.0).collect()
    by_event = {}
    for r in out:
        by_event.setdefault(r.eventId, []).append(r)
    # reference geometry (endPosn < len): 500 samples → 3 slices, the
    # final aligned window is NOT emitted (eventAnalyser.py:249-250)
    assert len(by_event[1]) == 3
    # emitted bins are 1..61 (fftPow[1:fftLen]): 5 Hz = bin 25 = index 24
    spec = np.array(by_event[1][0].spectrum)
    assert len(spec) == 61
    assert np.argmax(spec) == 24
    # flat event (2 dps → 1 slice) zeroed by the low-movement gate
    assert len(by_event[3]) == 1
    assert all(v == 0.0 for v in by_event[3][0].spectrum)


def test_w5_epoch_oracled_matches_production_kernel(spark, sf_dir):
    """The oracled full-pipeline sibling must agree with the production
    extract_epoch_features path (gravity high-pass ON) on the same
    input: its integer-quantized RMS is the kernel's
    activity_count_magnitude up to the 1e-6 signal quantization."""
    import pyspark.sql.functions as F

    from openseizuredatabase_spark.plans.registry import QUERIES

    out = {
        (r.eventId, r.startSample): r.rms_hp
        for r in QUERIES["w5_epoch_oracled"].fn(spark, sf_dir).collect()
    }
    assert len(out) > 0

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_id") < 800)
    )
    freq = (F.col("event_id") % 5 + 1).cast("double")
    dp = ev.select(
        (F.col("event_id") % 100).alias("eventId"),
        F.timestamp_micros(F.col("event_id") * 1_000_000).alias(
            "dpTimestamp"
        ),
        F.transform(
            F.sequence(F.lit(0), F.lit(24)),
            lambda i: F.round(
                F.sin(2 * math.pi * freq * i.cast("double") / 25.0) * 64, 0
            )
            / 64,
        ).alias("rawData"),
        F.lit(0.0).alias("hr"),
    )
    prod = feat.extract_epoch_features(
        dp, window_len=50, step=25, gravity_cutoff=0.5
    ).collect()
    assert len(prod) == len(out)
    for r in prod:
        got = out[(r.eventId, r.startSample)]
        want = r.features["activity_count_magnitude"]
        assert got == pytest.approx(want, abs=5e-6), (
            r.eventId,
            r.startSample,
        )
