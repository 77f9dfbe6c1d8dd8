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
