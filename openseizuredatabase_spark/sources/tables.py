"""Parquet table catalog for the driver's synthetic lake.

Reference parity: the reference loads JSON DB files into an in-memory list
(libosd/osdDbConnection.py:101-126) and linearly scans it; here every table
is a Parquet scan planned by Catalyst (predicate pushdown + column pruning),
which is the S1/S9 equivalent at lake scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one lake table; normalize timestamp physical types.

    The driver's events.parquet stores TIMESTAMP(NANOS) which Spark's
    vectorized reader rejects; read nanos as long (session conf, safe to
    set at runtime) and convert to a micros timestamp (integer division —
    matches DuckDB's truncation of nanos → micros).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # timestamps in the lake are naive/UTC; a non-UTC driver session would
    # shift every date_format()-derived oracle comparison
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # timestamp[us] columns written without isAdjustedToUTC would read as
    # TIMESTAMP_NTZ (Spark 4 default), which rejects cast-to-double and
    # unix_micros and diverges from DuckDB's naive-as-UTC reading; with a
    # UTC session, LTZ inference sees the identical instant.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # belt-and-braces for sessions where the conf above is ignored (e.g. a
    # cached reader): NTZ → LTZ is a wall-clock reinterpretation, exact
    # under the UTC session timezone set above
    for f in df.schema.fields:
        if isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def register_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table and register temp views (for the SQL API)."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def spread_small_scan(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Spread a too-few-partition scan across cores before CPU-heavy map
    work (tokenization, hashing, multi-format parsing).

    Real lakes scan into many partitions (many files / row groups) and
    this is a no-op. The local test data is one single-row-group file per
    table, so Spark plans a 1-partition scan and the whole map side would
    run on one core; a round-robin repartition of a few MB is orders of
    magnitude cheaper than serializing the map stage. At 100 TB the
    condition never fires — no extra exchange appears in the plan.
    """
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= min(4, target):
        return df
    return df.repartition(target)
