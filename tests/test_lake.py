"""Lake layout tests: partition structure, pruning, round-trip."""

import glob
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from openseizuredatabase_spark.sources.lake import (
    category_of,
    read_events_lake,
    write_events_lake,
)


@pytest.fixture(scope="module")
def lake_path(spark, tmp_path_factory):
    rows = [
        Row(id=1, userId="1", type="Seizure", eventTimestamp="2024-01-01 10:00:00"),
        Row(id=2, userId="2", type="False Alarm", eventTimestamp="2024-01-01 11:00:00"),
        Row(id=3, userId="1", type="Seizure", eventTimestamp="2024-01-02 10:00:00"),
        Row(id=4, userId="3", type=None, eventTimestamp="2024-01-02 12:00:00"),
    ]
    df = spark.createDataFrame(rows).withColumn(
        "eventTimestamp", F.to_timestamp("eventTimestamp")
    )
    path = str(tmp_path_factory.mktemp("lake") / "events")
    write_events_lake(df, path)
    return path


def test_partition_directories(lake_path):
    parts = {
        p.split("events/")[-1]
        for p in glob.glob(os.path.join(lake_path, "category=*", "event_date=*"))
    }
    assert "category=allSeizures/event_date=2024-01-01" in parts
    assert "category=falseAlarms/event_date=2024-01-01" in parts
    assert "category=unknownEvents/event_date=2024-01-02" in parts


def test_category_routing(spark):
    df = spark.createDataFrame(
        [Row(type=t) for t in ["Seizure", "false alarm", "Fall", "NDA", "whatever", None]]
    )
    got = [r.c for r in df.select(category_of().alias("c")).collect()]
    assert got == [
        "allSeizures", "falseAlarms", "fallEvents", "ndaEvents",
        "unknownEvents", "unknownEvents",
    ]


def test_partition_pruning_in_plan(spark, lake_path):
    df = read_events_lake(
        spark, lake_path, categories=["allSeizures"], date_from="2024-01-02"
    )
    assert [r.id for r in df.collect()] == [3]
    plan = df._jdf.queryExecution().executedPlan().toString()
    # pruning happens at the scan: partition filters present, no rows from
    # other categories read
    assert "PartitionFilters" in plan


def test_compact_events_lake(spark, tmp_path):
    from openseizuredatabase_spark.sources.lake import compact_events_lake

    rows = [
        Row(
            id=i,
            userId=str(i % 3),
            type="Seizure" if i % 2 == 0 else "False Alarm",
            eventTimestamp=f"2024-01-0{1 + i % 2} 10:{i % 60:02d}:00",
        )
        for i in range(60)
    ]
    df = spark.createDataFrame(rows).withColumn(
        "eventTimestamp", F.to_timestamp("eventTimestamp")
    )
    path = str(tmp_path / "events")
    # tiny maxRecordsPerFile forces a many-small-files layout
    write_events_lake(df, path, max_records_per_file=5)
    before = read_events_lake(spark, path)
    n_before = before.select(F.input_file_name()).distinct().count()
    content_before = sorted(r["id"] for r in before.collect())
    assert n_before >= 8

    stats = compact_events_lake(spark, path)
    assert stats["files_before"] == n_before
    assert stats["files_after"] < n_before

    after = read_events_lake(spark, path)
    assert sorted(r["id"] for r in after.collect()) == content_before
    # partition layout intact (pruning still works)
    pruned = read_events_lake(spark, path, categories=["allSeizures"])
    n_pruned = pruned.select(F.input_file_name()).distinct().count()
    assert n_pruned <= stats["files_after"]


def test_compact_scoped_partitions_only(spark, tmp_path):
    from openseizuredatabase_spark.sources.lake import (
        compact_events_lake,
        read_events_lake,
    )

    rows = [
        Row(
            id=i,
            userId=str(i),
            type="Seizure",
            eventTimestamp=f"2024-01-0{1 + i % 2} 09:00:00",
        )
        for i in range(20)
    ]
    df = spark.createDataFrame(rows).withColumn(
        "eventTimestamp", F.to_timestamp("eventTimestamp")
    )
    path = str(tmp_path / "events")
    write_events_lake(df, path, max_records_per_file=2)
    def _files(df):
        return {r[0] for r in df.select(F.input_file_name()).distinct().collect()}

    day2_files_before = _files(
        read_events_lake(spark, path, date_from="2024-01-02")
    )
    compact_events_lake(spark, path, date_to="2024-01-01")
    # out-of-scope partition untouched, byte-for-byte the same files
    day2_files_after = _files(
        read_events_lake(spark, path, date_from="2024-01-02")
    )
    assert day2_files_after == day2_files_before
    # in-scope partition compacted
    day1 = read_events_lake(spark, path, date_to="2024-01-01")
    assert len(_files(day1)) < 10
    assert day1.count() == 10


def test_morton_key_parity_with_python(spark):
    import random

    from pyspark.sql import functions as F

    from openseizuredatabase_spark.sources.lake import morton_key

    def py_morton(x, y, bits):
        k = 0
        for i in range(bits):
            k |= ((x >> i) & 1) << (2 * i)
            k |= ((y >> i) & 1) << (2 * i + 1)
        return k

    rng = random.Random(11)
    rows = [(i, rng.randrange(1 << 16), rng.randrange(1 << 16)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {
        r["id"]: r["z"]
        for r in df.select(
            "id", morton_key(F.col("x"), F.col("y"), 16).alias("z")
        ).collect()
    }
    for i, x, y in rows:
        assert got[i] == py_morton(x, y, 16)
    # interleave is a bijection on the square
    assert len(set(got.values())) == len(set((x, y) for _, x, y in rows))


def test_zorder_write_improves_file_locality(spark, tmp_path):
    import glob
    import random

    import pyarrow.parquet as pq

    from openseizuredatabase_spark.sources.lake import zorder_write

    rng = random.Random(5)
    rows = [
        (rng.randrange(256), rng.randrange(256)) for _ in range(4096)
    ]
    df = spark.createDataFrame(rows, "xq long, yq long")

    def bbox_area_sum(path):
        total = 0
        for f in glob.glob(f"{path}/*.parquet"):
            t = pq.read_table(f, columns=["xq", "yq"])
            xs, ys = t.column("xq").to_pylist(), t.column("yq").to_pylist()
            if xs:
                total += (max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1)
        return total

    plain = str(tmp_path / "plain")
    zord = str(tmp_path / "zord")
    df.repartition(16).write.parquet(plain)
    zorder_write(df, zord, "xq", "yq", bits=8, n_files=16)

    plain_area = bbox_area_sum(plain)
    z_area = bbox_area_sum(zord)
    # random layout: every file spans ~the full 256x256 square;
    # z-order: each file is a contiguous key range = a small tile
    assert z_area < plain_area / 4, (z_area, plain_area)
    # layout carries the locality; no helper column leaks into the data
    names = pq.read_schema(glob.glob(f"{zord}/*.parquet")[0]).names
    assert names == ["xq", "yq"]


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """Co-located join contract: two tables bucketed on the same key and
    count join with NO shuffle exchange — each task reads matching
    buckets side by side (the 100 TB fact-fact join shape)."""
    from pyspark.sql import Row

    from openseizuredatabase_spark.sources.lake import write_bucketed_table

    a = spark.createDataFrame(
        [Row(userId=i % 37, eventId=i, v=float(i)) for i in range(500)]
    )
    b = spark.createDataFrame(
        [Row(userId=i % 37, obsId=i, w=float(i * 2)) for i in range(500)]
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a real SMJ so the exchange-free claim is what's tested
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed_table(a, "t_bkt_a", "userId", n_buckets=8)
        write_bucketed_table(b, "t_bkt_b", "userId", n_buckets=8)
        joined = spark.table("t_bkt_a").join(spark.table("t_bkt_b"), "userId")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # and the result is the real join
        n = joined.count()
        expect = sum(
            (500 // 37 + (1 if k < 500 % 37 else 0)) ** 2 for k in range(37)
        )
        assert n == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_bkt_a")
        spark.sql("DROP TABLE IF EXISTS t_bkt_b")
