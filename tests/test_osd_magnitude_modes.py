"""OSD V1/V3 magnitude-mode parity vs the reference formulas
(testRunner/osdAlg.py:68-115 getAccelDataFromJson)."""

import math

import pytest
from pyspark.sql import functions as F

from openseizuredatabase_spark.detection.osd_alg import OsdSettings, run_osd_alg
from openseizuredatabase_spark.sources.ingest import accel_magnitude


def _ref_magnitude(data, data3d, mode, offset=0.0):
    # independent straight-line port of the reference semantics
    if mode == "V0":
        return data
    if data3d is None or len(data3d) == 0:
        return data
    out, data_sum = [], 0.0
    for n in range(len(data3d) // 3):
        x, y, z = data3d[3 * n], data3d[3 * n + 1], data3d[3 * n + 2]
        data_sum += x + y + z
        if mode == "V1":
            out.append(abs(x) + abs(y) + abs(z))
        elif mode == "V2":
            out.append(math.sqrt(x * x + y * y + z * z))
        elif mode == "V3":
            x, y, z = x + offset, y + offset, z + offset
            out.append(math.sqrt(x * x + y * y + z * z))
    if len(out) == 0 or data_sum == 0:
        return data
    return out


CASES = [
    ([10.0, 20.0], [1.0, -2.0, 2.0, 3.0, 0.0, -4.0]),  # normal 3D block
    ([10.0, 20.0], [0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),    # zero-sum → fallback
    ([10.0, 20.0], None),                               # no 3D → fallback
    ([10.0, 20.0], []),                                 # empty 3D → fallback
]


@pytest.mark.parametrize("mode,offset", [("V0", 0.0), ("V1", 0.0), ("V2", 0.0), ("V3", 7.5)])
def test_accel_magnitude_matches_reference(spark, mode, offset):
    df = spark.createDataFrame(
        [(i, d, d3) for i, (d, d3) in enumerate(CASES)],
        "id long, raw array<double>, raw3d array<double>",
    )
    got = {
        r["id"]: r["mag"]
        for r in df.select(
            "id",
            accel_magnitude(F.col("raw"), F.col("raw3d"), mode, offset).alias(
                "mag"
            ),
        ).collect()
    }
    for i, (d, d3) in enumerate(CASES):
        expect = _ref_magnitude(d, d3, mode, offset)
        assert got[i] == pytest.approx(expect), (mode, i)


def test_accel_magnitude_stays_in_codegen(spark):
    df = spark.createDataFrame(
        [(1, [1.0], [1.0, 2.0, 3.0])],
        "id long, raw array<double>, raw3d array<double>",
    )
    plan = (
        df.select(accel_magnitude(F.col("raw"), F.col("raw3d"), "V2"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_run_osd_alg_mode_changes_detection(spark):
    import datetime

    # V2 magnitude of a strong single-axis oscillation ≈ |x| — V1 triples
    # nothing here (y=z=0) so V1 == V2; but the zeroed-3D row must fall
    # back to the (flat) V0 array under both modes.
    def dp(eid, i, sig3d, sig):
        return (eid, datetime.datetime(2024, 1, 1, 0, 0, i), sig, sig3d)

    osc = []
    for i in range(125):
        # positive-valued 5 Hz tone: V2 magnitude == x, so the magnitude
        # itself oscillates inside the 3-8 Hz seizure ROI (|sin| would
        # double the frequency out of the ROI)
        osc += [1000.0 + 400.0 * math.sin(2 * math.pi * i / 5.0), 0.0, 0.0]
    rows = [dp(1, i, osc, [0.0] * 125) for i in range(5)]
    rows += [dp(2, i, [0.0] * 375, [0.0] * 125) for i in range(5)]
    df = spark.createDataFrame(
        rows,
        "eventId long, dpTimestamp timestamp, rawData array<double>, "
        "rawData3D array<double>",
    )
    out = run_osd_alg(
        df,
        OsdSettings(magnitude_mode="V2"),
        raw3d_col="rawData3D",
    )
    by_event = (
        out.groupBy("eventId").agg(F.max("alarmState").alias("m")).collect()
    )
    m = {r["eventId"]: r["m"] for r in by_event}
    assert m[1] == 2   # oscillation passes through V2 magnitude → alarms
    assert m[2] == 0   # zeroed 3D falls back to flat V0 array → silent


def _ref_axis_verdict(a, s):
    # osdAlg.py:235-258 straight-line: ratio + optional flap forcing
    import numpy as np

    from openseizuredatabase_spark.functions.signal import (
        roi_power,
        spec_power,
        spectrum_ratio,
    )

    a = np.asarray(a, float)
    sp = spec_power(a, s.sample_freq)
    rp = roi_power(a, s.freq_min, s.freq_max, s.sample_freq)
    ratio = spectrum_ratio(sp, rp, s.alarm_thresh)
    in_alarm = ratio > s.alarm_ratio_thresh
    if s.flap_enabled:
        frp = roi_power(a, s.flap_freq_min, s.flap_freq_max, s.sample_freq)
        if spectrum_ratio(sp, frp, s.flap_alarm_thresh) > s.flap_ratio_thresh:
            in_alarm = True
    return in_alarm


def _ref_machine(flags, s):
    from openseizuredatabase_spark.detection.osd_alg import alarm_recurrence

    return alarm_recurrence(flags, s)[0]


def _sine(freq, amp, n=125, fs=25.0, base=1000.0):
    import math

    return [base + amp * math.sin(2 * math.pi * freq * i / fs) for i in range(n)]


def test_flap_mode_forces_alarm(spark):
    # a 3 Hz-free signal with strong 2-4 Hz "flap" content must alarm
    # ONLY when the flap detector is enabled
    import datetime

    from openseizuredatabase_spark.detection.osd_alg import (
        OsdSettings,
        run_osd_alg,
    )

    flap_sig = _sine(2.2, 3000.0)  # in flap band, mostly outside 3-8 Hz ROI
    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, base + datetime.timedelta(seconds=5 * i), flap_sig)
         for i in range(4)],
        "eventId long, dpTimestamp timestamp, rawData array<double>",
    )
    plain = OsdSettings()
    flap = OsdSettings(flap_enabled=True, flap_alarm_thresh=10.0,
                       flap_ratio_thresh=20.0)
    got_plain = [r["alarmState"] for r in
                 run_osd_alg(df, plain).orderBy("dpTimestamp").collect()]
    got_flap = [r["alarmState"] for r in
                run_osd_alg(df, flap).orderBy("dpTimestamp").collect()]
    exp_plain = _ref_machine(
        [_ref_axis_verdict(flap_sig, plain)] * 4, plain)
    exp_flap = _ref_machine([_ref_axis_verdict(flap_sig, flap)] * 4, flap)
    assert got_plain == exp_plain
    assert got_flap == exp_flap
    assert max(got_flap) == 2 and max(got_plain) == 0  # flap is the trigger


def test_v4_mode_worst_axis_wins(spark):
    # seizure-band motion on ONE axis: magnitude modes may dilute it, V4
    # must catch it (osdAlg.py docstring: highest alarm level of the 3)
    import datetime

    from openseizuredatabase_spark.detection.osd_alg import (
        OsdSettings,
        run_osd_alg,
    )

    quiet = [1000.0] * 125
    shake = _sine(5.0, 2500.0, base=0.0)  # 5 Hz, in the 3-8 Hz ROI
    raw3d = []
    for n in range(125):
        raw3d += [quiet[n], quiet[n], shake[n]]  # z axis only
    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, base + datetime.timedelta(seconds=5 * i), quiet, raw3d)
         for i in range(4)],
        "eventId long, dpTimestamp timestamp, rawData array<double>, "
        "rawData3D array<double>",
    )
    s = OsdSettings(magnitude_mode="V4", alarm_thresh=10.0,
                    alarm_ratio_thresh=30.0)
    got = [r["alarmState"] for r in
           run_osd_alg(df, s, raw3d_col="rawData3D")
           .orderBy("dpTimestamp").collect()]
    per_axis = [
        _ref_axis_verdict(quiet, s),
        _ref_axis_verdict(quiet, s),
        _ref_axis_verdict(shake, s),
    ]
    exp = _ref_machine([any(per_axis)] * 4, s)
    assert got == exp
    assert max(got) == 2  # one hot axis is enough


def test_v4_missing_3d_is_invalid_not_crash(spark):
    import datetime

    from openseizuredatabase_spark.detection.osd_alg import (
        OsdSettings,
        run_osd_alg,
    )

    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, base, [1000.0] * 125, []),
         (1, base + datetime.timedelta(seconds=5), [1000.0] * 125,
          [0.0] * 375)],
        "eventId long, dpTimestamp timestamp, rawData array<double>, "
        "rawData3D array<double>",
    )
    s = OsdSettings(magnitude_mode="V4")
    out = run_osd_alg(df, s, raw3d_col="rawData3D").collect()
    assert [r["alarmState"] for r in out] == [0, 0]
