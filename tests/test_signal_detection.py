"""Signal kernels + detection replay, validated on synthetic sinusoid
events with known expected alarm outcomes (FIXTURES §5 / the reference's
generateSimulatedEvents strategy: 5 Hz high-amplitude ⇒ ALARM, 1 Hz or
low amplitude ⇒ OK)."""

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from openseizuredatabase_spark.detection.hr_alg import (
    MODE_ADAPTIVE,
    MODE_SIMPLE,
    HrSettings,
    run_hr_alg,
)
from openseizuredatabase_spark.detection.osd_alg import (
    OsdSettings,
    alarm_recurrence,
    run_osd_alg,
    run_state_machine,
)
from openseizuredatabase_spark.functions import signal as sig


def sine(freq, amp, n=125, fs=25.0, baseline=1000.0):
    t = np.arange(n) / fs
    return baseline + amp * np.sin(2 * np.pi * freq * t)


# --- numpy kernel semantics ------------------------------------------------


def test_fft_power_is_magnitude_squared():
    x = sine(5.0, 100.0)
    p = sig.fft_power(x)
    assert len(p) == 63  # bins 0..n//2
    # 5 Hz on a 125-sample/25 Hz frame = bin 25 exactly
    assert np.argmax(p[1:]) + 1 == 25


def test_spec_and_roi_power_scaling():
    """Quick scaling sanity (the byte-exact fidelity gate is the
    literal-port golden in test_osd_reference_parity.py): specPower is
    the SUM of bins 1..min(cutoff, n//2-1) / n / 2 / 1000 with the
    12.0 Hz android cutoff, roiPower the mean over [lo, hi) / 1000
    (osdAlg.py:161-187,211-212)."""
    x = sine(5.0, 100.0)
    fft = np.fft.fft(x)[:63]
    p = fft.real**2 + fft.imag**2
    cutoff = int(12.0 / (1.0 / 5.0))  # 60 — android-consistency 12.0 Hz
    expect_spec = p[1 : cutoff + 1].sum() / 125 / 2 / 1000.0
    lo, hi = int(3 / 0.2), int(8 / 0.2)  # 15, 40 — top bin EXCLUDED
    expect_roi = p[lo:hi].sum() / (hi - lo) / 1000.0
    assert math.isclose(sig.spec_power(x), expect_spec)
    assert math.isclose(sig.roi_power(x), expect_roi)


def test_spectrum_ratio_gating():
    assert sig.spectrum_ratio(10.0, 50.0, alarm_thresh=100.0) == 0.0  # below gate
    assert sig.spectrum_ratio(10.0, 500.0, alarm_thresh=100.0) == 500.0


def test_tapers():
    for kind in ("rect", "hamming", "hann", "triangular", "raised_cosine"):
        w = sig.taper(kind, 125)
        assert len(w) == 125
        assert np.all(np.isfinite(w))
    assert np.allclose(sig.taper("rect", 8), 1.0)
    assert sig.taper("hann", 125)[0] == pytest.approx(0.0)


# --- recurrence semantics (SURVEY §7.4 risk 5) -----------------------------


def test_alarm_recurrence_accumulate_and_decay():
    s = OsdSettings(sample_period=5, warn_time=5, alarm_time=10)
    # 3 in-alarm dps: counts 5,10,15 → states 0 (5≤5), 1 (10>5), 2 (15>10)
    states, counts = alarm_recurrence([True, True, True, False, False], s)
    assert states == [0, 1, 2, 1, 0]
    # ALARM→WARN decay pins count to warnTime, then full reset
    assert counts == [5, 10, 15, 5, 0]


def test_alarm_recurrence_missing_resets():
    s = OsdSettings(sample_period=5, warn_time=5, alarm_time=10)
    states, counts = alarm_recurrence(
        [True, True, True, False, True],
        s,
        missing=[False, False, False, True, False],
    )
    # missing step: full reset to 0/0 — even from ALARM, skipping the
    # 2→1 decay (the reference's -1 assignment at hrAlg.py:123-127 is
    # immediately overwritten by the fall-through at :147-156); the
    # next in-alarm step accumulates from 0 with state still 0 (count
    # 5 crosses no threshold)
    assert states == [0, 1, 2, 0, 0]
    assert counts == [5, 10, 15, 0, 5]


# --- end-to-end replay on simulated events ---------------------------------


@pytest.fixture(scope="module")
def sim_events(spark):
    """Three simulated events: seizure-band shaking, normal-band motion,
    low-amplitude seizure-band (below power threshold)."""
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    specs = {
        101: (5.0, 600.0),  # 5 Hz, high amplitude → should ALARM
        102: (1.0, 600.0),  # 1 Hz (outside 3-8 Hz ROI) → OK
        103: (5.0, 5.0),  # 5 Hz but tiny → below alarmThresh → OK
    }
    for eid, (freq, amp) in specs.items():
        for k in range(6):  # 6 dps = 30 s
            rows.append(
                Row(
                    eventId=eid,
                    dpTimestamp=base + dt.timedelta(seconds=5 * k),
                    rawData=[float(v) for v in sine(freq, amp)],
                )
            )
    return spark.createDataFrame(rows)


def test_osd_alg_golden_outcomes(sim_events):
    out = run_osd_alg(sim_events, OsdSettings()).toPandas()
    worst = out.groupby("eventId")["alarmState"].max().to_dict()
    assert worst[101] == 2, "high-amplitude 5 Hz event must reach ALARM"
    assert worst[102] == 0, "1 Hz event must stay OK"
    assert worst[103] == 0, "sub-threshold event must stay OK"
    # within the alarming event the machine walks OK→WARN→ALARM in order
    e101 = out[out.eventId == 101].sort_values("dpTimestamp")["alarmState"].tolist()
    assert e101 == sorted(e101)


def test_osd_alg_state_resets_between_events(sim_events):
    out = run_osd_alg(sim_events, OsdSettings()).toPandas()
    firsts = out.sort_values("dpTimestamp").groupby("eventId").first()
    # first dp of every event starts from a reset machine: count ≤ samplePeriod
    assert (firsts["alarmCount"] <= 5.0).all()


def test_run_state_machine_generic(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(g=1, t=base + dt.timedelta(seconds=5 * i), flag=f, rid=i)
        for i, f in enumerate([True, True, True, False])
    ]
    out = run_state_machine(
        spark.createDataFrame(rows), ["g"], "t", "flag", "rid",
        OsdSettings(sample_period=5, warn_time=5, alarm_time=10),
    ).toPandas().sort_values("rid")
    assert out["alarmState"].tolist() == [0, 1, 2, 1]


def test_hr_alg_simple_and_adaptive(spark):
    base = dt.datetime(2024, 1, 1)

    def mk(eid, hrs):
        return [
            Row(eventId=eid, dpTimestamp=base + dt.timedelta(seconds=5 * i), hr=float(h))
            for i, h in enumerate(hrs)
        ]

    # simple mode: 3 tachycardic dps then recovery; missing (-1) fully
    # resets to 0 (the reference's dead -1 store, see alarm_recurrence)
    rows = mk(1, [80, 130, 130, 130, 80, -1, 80])
    df = spark.createDataFrame(rows)
    out = (
        run_hr_alg(df, HrSettings(mode=MODE_SIMPLE, thresh_high=120, thresh_low=40,
                                  sample_period=5, warn_time=5, alarm_time=10))
        .toPandas().sort_values("dpTimestamp")
    )
    assert out["alarmState"].tolist() == [0, 0, 1, 2, 1, 0, 0]

    # adaptive mode: stable 60 bpm baseline then a +50 jump over baseline+30
    rows = mk(2, [60] * 6 + [110, 110])
    out2 = (
        run_hr_alg(spark.createDataFrame(rows),
                   HrSettings(mode=MODE_ADAPTIVE, thresh_offset_high=30,
                              thresh_offset_low=20, moving_average_window_dps=12,
                              sample_period=5, warn_time=5, alarm_time=10))
        .toPandas().sort_values("dpTimestamp")
    )
    # dp7: avg=(360+110)/7≈67.1, thresh≈97.1 → in-alarm, count 5 → state 0
    # dp8: avg=(360+220)/8=72.5, thresh 102.5 → in-alarm, count 10 → WARN
    assert out2["alarmState"].tolist()[-2:] == [0, 1]


def test_sql_line_length_and_zcr(spark):
    x = [0.0, 1.0, 0.0, -1.0, 0.0]
    df = spark.createDataFrame([Row(a=x)])
    row = df.select(
        sig.mean_line_length(F.col("a")).alias("ll"),
        sig.zero_crossing_rate(F.col("a"), mean_center=False).alias("zcr"),
    ).collect()[0]
    assert row.ll == 1.0  # |1|+|−1|+|−1|+|1| / 4
    # sign series 0,1,0,-1,0 → |diffs| = 1,1,1,1 → 4/(2*5)
    assert row.zcr == pytest.approx(0.4)


def test_taper_column_and_normalize(spark):
    df = spark.createDataFrame([Row(a=[2.0, 2.0, 2.0, 2.0])])
    out = df.select(
        sig.taper_column(F.col("a"), "rect", 4).alias("t"),
        sig.normalize_spectrum(F.col("a")).alias("n"),
    ).collect()[0]
    assert out.t == [2.0, 2.0, 2.0, 2.0]
    assert out.n == [1.0, 1.0, 1.0, 1.0]


def test_with_fft_features_matches_kernels(spark):
    x = sine(5.0, 600.0)
    df = spark.createDataFrame([Row(id=1, rawData=[float(v) for v in x])])
    out = sig.with_fft_features(df, "rawData").collect()[0]
    assert out.specPower_c == pytest.approx(sig.spec_power(x))
    assert out.roiPower_c == pytest.approx(sig.roi_power(x))


def test_run_state_machine_survives_arrow_batch_splits(spark):
    """A key whose rows span multiple Arrow batches must carry machine
    state across the batch boundary (mapInPandas chunking)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    n = 500
    rows = [
        Row(g=1, t=base + dt.timedelta(seconds=5 * i), flag=True, rid=i)
        for i in range(n)
    ]
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "37")
    try:
        out = (
            run_state_machine(
                spark.createDataFrame(rows), ["g"], "t", "flag", "rid",
                OsdSettings(sample_period=5, warn_time=5, alarm_time=10),
            )
            .toPandas()
            .sort_values("rid")
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    # continuous in-alarm run: count must accumulate 5,10,15,... without
    # ever resetting at a batch boundary
    assert out["alarmCount"].tolist() == [5.0 * (i + 1) for i in range(n)]
    assert out["alarmState"].tolist()[:3] == [0, 1, 2]
    assert set(out["alarmState"].tolist()[3:]) == {2}


# --- dataVisualiser spectral-panel kernels (round-10, SURVEY §2.13) ---------


def test_band_energies_matches_panel_loop():
    """Literal replay of frequency_band_energy_plotter.py:12-36 over a
    deterministic signal: full-FFT |X| magnitudes, fftfreq masks with
    INCLUSIVE edges applied to the whole bin array (negative freqs never
    pass >= 0; DC lands in the low band), fs=125 quirk preserved."""
    rng = np.arange(64, dtype=np.float64)
    s = np.sin(rng * 0.7) * 40 + (rng % 5) * 3 + 100

    # the reference panel's own lines
    fft_values = np.fft.fft(s)
    fft_freqs = np.fft.fftfreq(len(s), 1 / 125)
    fft_magnitude = np.abs(fft_values)
    want = [
        float(fft_magnitude[(fft_freqs >= lo) & (fft_freqs <= hi)].sum())
        for lo, hi in [(0, 2), (2, 10), (10, 25)]
    ]
    got = sig.band_energies(s, 125.0, [(0, 2), (2, 10), (10, 25)])
    assert got == want
    # DC belongs to the low band (inclusive >= 0): zeroing the mean moves
    # low_e by exactly |sum(s)| plus the k=1 change — cheap structural
    # check that bin 0 participates
    assert got[0] > sig.band_energies(s - s.mean(), 125.0, [(0, 2)])[0]


def test_demeaned_fft_magnitudes_matches_panel_loop():
    """fft_plotter.py:28-47: demean, FFT, positive-half magnitudes."""
    rng = np.arange(50, dtype=np.float64)
    s = np.cos(rng * 0.3) * 7 + 55
    raw = s - np.mean(s)
    want = np.abs(np.fft.fft(raw))[: len(raw) // 2]
    got = sig.demeaned_fft_magnitudes(s)
    assert np.array_equal(got, want)
    assert got[0] < 1e-9  # DC removed


def test_with_band_energy_panel_stage(spark):
    """The Spark stage carries every input column plus band_e*/
    demeaned_mag_sum, NULL-preserving on empty signals."""
    rows = [
        (1, [float(i % 7) * 3 + 10 for i in range(64)]),
        (2, []),
    ]
    df = spark.createDataFrame(rows, "vec_id long, rawData array<double>")
    out = sig.with_band_energy_panel(df, "rawData", fs=125.0).toPandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    want = sig.band_energies(
        np.asarray(rows[0][1]), 125.0, [(0, 2), (2, 10), (10, 25)]
    )
    assert [out.band_e0[0], out.band_e1[0], out.band_e2[0]] == want
    assert out.demeaned_mag_sum[0] == float(
        sig.demeaned_fft_magnitudes(np.asarray(rows[0][1])).sum()
    )
    assert out.band_e0[1] is None or np.isnan(out.band_e0[1])
