"""Streaming-mode tests: drive the streaming operators to completion with
a file source + memory sink (processAllAvailable), and check parity with
the batch implementations."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from openseizuredatabase_spark.detection.osd_alg import (
    OsdSettings,
    run_state_machine,
)
from openseizuredatabase_spark.streaming.sessionize import (
    session_clusters,
    streaming_alarm_machine,
    windowed_counts,
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("flag", T.BooleanType()),
    ]
)


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    base = dt.datetime(2024, 1, 1)
    rows = []
    for u in (1, 2):
        # 4 dps 5s apart (one session), a 2-min hole, then 2 more
        for i in range(4):
            rows.append(Row(user_id=u, ts=base + dt.timedelta(seconds=5 * i), flag=True))
        for i in range(2):
            rows.append(
                Row(user_id=u, ts=base + dt.timedelta(seconds=140 + 5 * i), flag=False)
            )
    path = str(tmp_path_factory.mktemp("stream"))
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(path)
    return path


def _run_to_memory(df, name, mode="append"):
    # aggregations use "complete": with a finite replay nothing advances
    # the watermark past the last window, so append would emit nothing
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_session_clusters_stream(spark, stream_dir):
    stream = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    out = session_clusters(stream, "ts", ["user_id"], gap="60 seconds")
    _run_to_memory(out, "sessions", "complete")
    rows = spark.sql("SELECT * FROM sessions").collect()
    # per user: one 4-dp session and one 2-dp session
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(r.n)
    assert {u: sorted(v) for u, v in per_user.items()} == {1: [2, 4], 2: [2, 4]}


def test_windowed_counts_stream(spark, stream_dir):
    stream = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    out = windowed_counts(stream, "ts", ["user_id"], window_duration="3 minutes")
    _run_to_memory(out, "windows", "complete")
    rows = spark.sql("SELECT * FROM windows ORDER BY user_id, bucket_start").collect()
    # all 6 dps per user fall in the single 00:00-00:03 bucket
    assert [(r.user_id, r.n) for r in rows] == [(1, 6), (2, 6)]


def test_streaming_alarm_machine_matches_batch(spark, stream_dir):
    settings = OsdSettings(sample_period=5, warn_time=5, alarm_time=10)
    stream = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    out = streaming_alarm_machine(stream, "user_id", "ts", "flag", settings)
    _run_to_memory(out, "alarms")
    got = {
        (r.user_id, r.ts): (r.alarmState, r.alarmCount)
        for r in spark.sql("SELECT * FROM alarms").collect()
    }
    batch_df = spark.read.parquet(stream_dir).withColumn("rid", F.monotonically_increasing_id())
    batch_out = run_state_machine(batch_df, ["user_id"], "ts", "flag", "rid", settings)
    joined = batch_df.select("user_id", "ts", "rid").join(batch_out, ["user_id", "rid"])
    expect = {
        (r.user_id, r.ts): (r.alarmState, r.alarmCount) for r in joined.collect()
    }
    assert got == expect
    # and the machine actually walked to ALARM on the 4-dp run
    states = [got[(1, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=5 * i))][0] for i in range(4)]
    assert states == [0, 1, 2, 2]
