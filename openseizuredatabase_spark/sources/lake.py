"""Canonical lake layout — the physical design that makes every operator
in this engine work at 100 TB.

The reference stores per-category JSON array files read whole into memory
(osdDbConnection.py:92-126). The lake equivalent:

* ``events`` partitioned by (category, event_date): partition pruning
  serves F3/F4/F6 (category + date-range predicates) without touching
  irrelevant files; each partition's files are sorted by (userId,
  eventTimestamp) so per-user time-ordered stages (D1/D2, W3-W7,
  detection replay) read nearly-clustered data.
* file sizing via ``maxRecordsPerFile`` — many ~128 MB-class files per
  partition, not one giant file: 1000 executors need parallel splits.
* optional bucketing by the dominant join/group key (userId) via
  ``bucketBy`` when a metastore is available (saveAsTable) — co-locates
  D1/D2/W* shuffles into bucket-local work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def category_of(type_col: str = "type") -> F.Column:
    """Reference category routing (tidy_db.py:23-29 file list)."""
    t = F.lower(F.coalesce(F.col(type_col), F.lit("")))
    return (
        F.when(t == "seizure", "allSeizures")
        .when(t == "false alarm", "falseAlarms")
        .when(t == "fall", "fallEvents")
        .when(t == "nda", "ndaEvents")
        .otherwise("unknownEvents")
    )


def write_events_lake(
    events: DataFrame,
    path: str,
    ts_col: str = "eventTimestamp",
    max_records_per_file: int = 500_000,
    mode: str = "overwrite",
) -> None:
    """Write the canonical partitioned events table."""
    out = (
        events.withColumn("category", category_of())
        .withColumn("event_date", F.to_date(F.col(ts_col)))
        .repartition("category", "event_date")
        .sortWithinPartitions("userId", ts_col)
    )
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("category", "event_date")
        .parquet(path)
    )


def read_events_lake(
    spark: SparkSession,
    path: str,
    categories: list[str] | None = None,
    date_from: str | None = None,
    date_to: str | None = None,
) -> DataFrame:
    """Read with partition pruning: category/date predicates resolve at
    the file listing, never scanning excluded partitions."""
    df = spark.read.parquet(path)
    if categories:
        df = df.filter(F.col("category").isin(categories))
    if date_from:
        df = df.filter(F.col("event_date") >= F.lit(date_from))
    if date_to:
        df = df.filter(F.col("event_date") <= F.lit(date_to))
    return df


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str = "userId",
    n_buckets: int = 256,
) -> None:
    """Bucketed variant (needs a metastore): joins/aggregations on
    ``bucket_col`` become shuffle-free bucket-local work."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table_name)
    )
