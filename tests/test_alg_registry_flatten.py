"""Algorithm registry (testRunner equivalent) + flatten view tests."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from openseizuredatabase_spark.detection.registry import (
    ALGORITHMS,
    algorithm_report,
    evaluate_algorithms,
    register,
)
from openseizuredatabase_spark.sources.ingest import (
    flatten_view,
    has_accel_data,
    type_to_label,
    zero_datapoint,
)


def sine(freq, amp, n=125, fs=25.0, baseline=1000.0):
    t = np.arange(n) / fs
    return baseline + amp * np.sin(2 * np.pi * freq * t)


@pytest.fixture(scope="module")
def dp_frame(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    for eid, (freq, amp, hr) in {
        1: (5.0, 600.0, 130.0),   # seizure-like shaking + tachycardia
        2: (1.0, 600.0, 70.0),    # benign motion, normal HR
    }.items():
        for k in range(4):
            rows.append(
                Row(
                    eventId=eid,
                    dpTimestamp=base + dt.timedelta(seconds=5 * k),
                    rawData=[float(v) for v in sine(freq, amp)],
                    hr=hr,
                )
            )
    return spark.createDataFrame(rows)


def test_evaluate_algorithms_grid(spark, dp_frame):
    out = evaluate_algorithms(dp_frame, ["osd", "hr_simple"])
    per = {
        (r.algorithm, r.eventId): r.worst
        for r in out.groupBy("algorithm", "eventId")
        .agg(F.max("alarmState").alias("worst"))
        .collect()
    }
    assert per[("osd", 1)] == 2       # 5 Hz high-amp → ALARM
    assert per[("osd", 2)] == 0       # 1 Hz → OK
    assert per[("hr_simple", 1)] == 2  # 130 bpm > 120 threshold
    assert per[("hr_simple", 2)] == 0


def test_algorithm_report_confusion(spark, dp_frame):
    labels = spark.createDataFrame(
        [Row(eventId=1, is_seizure=True), Row(eventId=2, is_seizure=False)]
    )
    per_dp = evaluate_algorithms(dp_frame, ["osd", "hr_simple"])
    rep = {r.algorithm: r for r in algorithm_report(per_dp, labels).collect()}
    assert rep["osd"].ntp == 1 and rep["osd"].ntn == 1
    assert rep["osd"].tpr == 1.0 and rep["osd"].tnr == 1.0


def test_register_custom_algorithm(spark, dp_frame):
    def always_alarm(dps):
        return dps.select(
            "eventId", "dpTimestamp", F.lit(2).alias("alarmState")
        )

    register("always", lambda dps: always_alarm(dps))
    try:
        out = evaluate_algorithms(dp_frame, ["always"])
        assert out.filter("alarmState <> 2").count() == 0
    finally:
        ALGORITHMS.pop("always")


def test_type_to_label(spark):
    df = spark.createDataFrame(
        [Row(t=x) for x in ["Seizure", "False Alarm", "NDA", "Fall", None]]
    )
    got = [r.l for r in df.select(type_to_label(F.col("t")).alias("l")).collect()]
    assert got == [1, 0, 0, 2, 2]


def test_has_accel_data(spark):
    rows = [
        Row(id=1, raw=[0.0] * 5, raw3d=None),          # all-zero → absent
        Row(id=2, raw=None, raw3d=[0.0, 1.0, 0.0]),    # 3d present
        Row(id=3, raw=[0.0, 2.0], raw3d=None),         # raw present
        Row(id=4, raw=None, raw3d=None),
    ]
    df = spark.createDataFrame(rows)
    got = {
        r.id: r.ok
        for r in df.select(
            "id", has_accel_data(F.col("raw"), F.col("raw3d")).alias("ok")
        ).collect()
    }
    assert got == {1: False, 2: True, 3: True, 4: False}


def test_zero_datapoint_template(spark):
    df = spark.range(1).select(zero_datapoint(F.lit(1704067200)).alias("dp"))
    dp = df.collect()[0].dp
    assert dp.rawData == [0.0] * 125
    assert len(dp.rawData3D) == 375
    assert dp.alarmState == 0
    assert dp.dataTime.startswith("2024-01-01")


def test_flatten_view_shape(spark, dp_frame):
    dps = dp_frame.withColumn("userId", F.lit("1")).withColumn(
        "type", F.lit("Seizure")
    ).withColumn("subType", F.lit("Tonic-Clonic")).withColumn(
        "alarmState", F.lit(0)
    ).withColumn("specPower", F.lit(0.0)).withColumn(
        "roiPower", F.lit(0.0)
    ).withColumn("o2Sat", F.lit(98.0)).withColumn(
        "rawData3D", F.expr("transform(sequence(1, 375), i -> cast(i as double))")
    )
    flat = flatten_view(dps)
    assert len(flat.columns) == 10 + 4 * 125
    row = flat.limit(1).collect()[0]
    assert row.typeStr == "Seizure/Tonic-Clonic"
    assert row.type == 1
    # de-interleave check: X000=1, Y000=2, Z000=3 from the 1..375 ramp
    assert (row.X000, row.Y000, row.Z000) == (1.0, 2.0, 3.0)
    assert row.X001 == 4.0


def test_registry_exposes_osd_variants(spark):
    import datetime

    from openseizuredatabase_spark.detection.registry import ALGORITHMS

    assert {"osd", "osd_flap", "osd_v4"} <= set(ALGORITHMS)
    base = datetime.datetime(2024, 1, 1)
    quiet = [1000.0] * 125
    rows = [
        (1, base + datetime.timedelta(seconds=5 * i), quiet, [1.0] * 375)
        for i in range(2)
    ]
    df = spark.createDataFrame(
        rows,
        "eventId long, dpTimestamp timestamp, rawData array<double>, "
        "rawData3D array<double>",
    )
    for name in ("osd_flap", "osd_v4"):
        out = ALGORITHMS[name](df).collect()
        assert len(out) == 2
        assert all(r["alarmState"] == 0 for r in out)
